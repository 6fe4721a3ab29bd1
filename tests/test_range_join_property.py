"""Property test: the interval join's half-open boundary semantics
[o_orderdate, o_orderdate + 90d) against a from-scratch computation, with
ship dates generated exactly AT both boundaries."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = datetime.datetime(1995, 1, 1)

# day offsets relative to the order date, hitting both edges exactly
ship_offsets = st.sampled_from([-1, 0, 1, 45, 89, 90, 91, 180])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 3), ship_offsets), min_size=1, max_size=12
    )
)
def test_interval_join_boundaries(spark, items):
    from pyspark.sql import functions as F

    orders = spark.createDataFrame(
        [(k, BASE + datetime.timedelta(days=30 * k)) for k in range(4)],
        "o_orderkey long, o_orderdate timestamp",
    )
    lines = spark.createDataFrame(
        [
            (i, k, BASE + datetime.timedelta(days=30 * k + off))
            for i, (k, off) in enumerate(items)
        ],
        "l_id long, l_orderkey long, l_shipdate timestamp",
    )
    cond = (
        (lines["l_orderkey"] == orders["o_orderkey"])
        & (lines["l_shipdate"] >= orders["o_orderdate"])
        & (lines["l_shipdate"] < orders["o_orderdate"] + F.expr("INTERVAL 90 DAYS"))
    )
    got = {r["l_id"] for r in lines.join(orders, cond).collect()}
    want = {i for i, (k, off) in enumerate(items) if 0 <= off < 90}
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    obs=st.dictionaries(
        st.integers(0, 40), st.floats(0, 100, allow_nan=False, width=32),
        min_size=2, max_size=12,
    )
)
def test_linear_interpolation_matches_pandas(spark, obs):
    """The calendar-spine linear gap-fill (c_interpolate_daily's core) must
    agree with pandas Series.interpolate(method='linear') on arbitrary
    sparse daily series (observed points keep their exact value; gaps get
    the linear blend of the bracketing observations)."""
    import datetime

    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = datetime.date(2024, 1, 1)
    rows = sorted(
        (base + datetime.timedelta(days=k), round(float(v), 3))
        for k, v in obs.items()
    )
    dim = spark.createDataFrame(rows, "date date, price double")
    bounds = dim.agg(F.min("date").alias("lo"), F.max("date").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("date")
    )
    j = spine.join(dim, "date", "left")
    wp = Window.orderBy("date").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.orderBy("date").rowsBetween(0, Window.unboundedFollowing)
    obs_date = F.when(F.col("price").isNotNull(), F.col("date"))
    j2 = j.select(
        "date", "price",
        F.last("price", ignorenulls=True).over(wp).alias("prev_p"),
        F.last(obs_date, ignorenulls=True).over(wp).alias("prev_d"),
        F.first("price", ignorenulls=True).over(wn).alias("next_p"),
        F.first(obs_date, ignorenulls=True).over(wn).alias("next_d"),
    )
    frac = F.datediff("date", "prev_d") / F.datediff("next_d", "prev_d")
    # Compare the UNROUNDED doubles with a tolerance: rounding both sides
    # first is tie-fragile (Spark F.round is HALF_UP, Python round is
    # banker's HALF_EVEN, so an exact .5 tie like 0.0078125 rounds to
    # 0.007813 vs 0.007812 — a 1e-6 gap that is pure rounding-mode skew).
    got = {
        r["date"]: r["filled"]
        for r in j2.select(
            "date",
            F.when(F.col("price").isNotNull(), F.col("price"))
            .when(F.col("next_d") == F.col("prev_d"), F.col("prev_p"))
            .otherwise(F.col("prev_p") + (F.col("next_p") - F.col("prev_p")) * frac)
            .alias("filled"),
        ).collect()
    }

    s = pd.Series(
        {pd.Timestamp(d): v for d, v in rows}
    ).resample("D").mean().interpolate(method="linear")
    want = {ts.date(): float(v) for ts, v in s.items()}
    assert set(got) == set(want)
    for d in got:
        assert abs(got[d] - want[d]) < 1e-9, (d, got[d], want[d])


def test_linear_interpolation_half_tie_regression(spark):
    """Regression pin for the exact .5 rounding tie hypothesis found in
    round 7: obs day0=0.0, day32=0.25 interpolates day 1 to exactly
    0.25/32 = 0.0078125, whose 6-decimal rounding differs between Spark's
    HALF_UP and Python's HALF_EVEN. The engine value itself is exact; this
    test asserts the unrounded doubles agree to 1e-12."""
    import datetime

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = datetime.date(2024, 1, 1)
    rows = [(base, 0.0), (base + datetime.timedelta(days=32), 0.25)]
    dim = spark.createDataFrame(rows, "date date, price double")
    bounds = dim.agg(F.min("date").alias("lo"), F.max("date").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("date")
    )
    j = spine.join(dim, "date", "left")
    wp = Window.orderBy("date").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.orderBy("date").rowsBetween(0, Window.unboundedFollowing)
    obs_date = F.when(F.col("price").isNotNull(), F.col("date"))
    j2 = j.select(
        "date", "price",
        F.last("price", ignorenulls=True).over(wp).alias("prev_p"),
        F.last(obs_date, ignorenulls=True).over(wp).alias("prev_d"),
        F.first("price", ignorenulls=True).over(wn).alias("next_p"),
        F.first(obs_date, ignorenulls=True).over(wn).alias("next_d"),
    )
    frac = F.datediff("date", "prev_d") / F.datediff("next_d", "prev_d")
    got = {
        r["date"]: r["filled"]
        for r in j2.select(
            "date",
            F.when(F.col("price").isNotNull(), F.col("price"))
            .otherwise(F.col("prev_p") + (F.col("next_p") - F.col("prev_p")) * frac)
            .alias("filled"),
        ).collect()
    }
    day1 = base + datetime.timedelta(days=1)
    assert abs(got[day1] - 0.0078125) < 1e-12
    for k in range(33):
        d = base + datetime.timedelta(days=k)
        assert abs(got[d] - 0.25 * k / 32.0) < 1e-12, (d, got[d])
