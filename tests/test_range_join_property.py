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
