"""Property-based equivalence of the loop→window rewrite (SURVEY.md §7.3 #1).

The reference processes P5 sequentially: a loop-carried `seen` set changes
later rows' routing (updatescript.py:174-186). Our engine re-derives it as a
window function. This test pits the Spark set-based operator against a direct
sequential simulation of the §8.P5 routing table (written from the SURVEY
formula — independent transcription, not a port) on hypothesis-generated
batches, including intra-batch repeat users, Δ<0, failed rows, and
watermark-boundary ties.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WM = datetime.datetime(2024, 1, 15)


def simulate_routing(rows: list[dict]) -> set[tuple]:
    """Sequential transcription of SURVEY.md §8.P5: cursor order =
    (ts, event_id); seen = users with ts<=WM successful rows (the fixture
    simulation of pre-batch AUM) ∪ users that emitted an AUM row earlier in
    this batch."""
    seen = {
        r["user_id"]
        for r in rows
        if r["ts"] <= WM and r["event_type"] != "error"
    }
    out: set[tuple] = set()
    for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"])):
        if r["ts"] <= WM or r["event_type"] == "error":
            continue
        chain = "polkadot" if r["event_id"] % 2 == 0 else "kusama"
        delta = r["value"] - r["bonded"]
        if delta == 0:
            out.add((r["event_id"], chain, "nominations", r["value"]))
        elif delta > 0:
            if chain == "polkadot":
                out.add((r["event_id"], chain, "amountstaked", delta))
            else:
                out.add((r["event_id"], chain, "nominations", delta))
        if delta != 0 or r["user_id"] not in seen:
            vol = r["value"] if r["user_id"] not in seen else delta
            out.add((r["event_id"], chain, "aum", vol))
            seen.add(r["user_id"])
    return out


row_strategy = st.fixed_dictionaries(
    {
        "user_id": st.integers(0, 3),
        "event_type": st.sampled_from(["purchase", "click", "error"]),
        # small grids so stake==bonded / delta<0 / delta>0 all occur often
        "value": st.sampled_from([1.0, 2.0, 5.0]),
        "bonded": st.sampled_from([0.0, 1.0, 2.0, 5.0]),
        # days around the watermark, including exactly-at-watermark ties
        "day_offset": st.integers(-2, 2),
    }
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(row_strategy, min_size=1, max_size=14))
def test_window_rewrite_matches_sequential_simulation(spark, raw_rows):
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.operators.reference_ops import aum_routing

    rows = []
    for i, r in enumerate(raw_rows):
        rows.append(
            {
                "event_id": i,
                "ts": WM + datetime.timedelta(days=r["day_offset"], minutes=i),
                "user_id": r["user_id"],
                "event_type": r["event_type"],
                "value": r["value"],
                "bonded": r["bonded"],
            }
        )
    # exactly-at-watermark tie row (strict `>` must exclude it)
    rows[0]["ts"] = WM

    events = spark.createDataFrame(
        [
            (
                r["event_id"],
                r["ts"],
                r["user_id"],
                r["event_type"],
                r["value"],
                '{"k": %s}' % r["bonded"],
            )
            for r in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {
        (row["event_id"], row["chain"], row["sink"], row["volume"])
        for row in aum_routing(events, watermark="2024-01-15 00:00:00").collect()
    }
    assert got == simulate_routing(rows)


def test_whale_key_fused_routing_correct_and_observed(spark):
    """Round 10 (verdict item 3): the fused single-scan aum_routing holds
    ONE user's entire batch in one aggregation buffer, so a skewed whale
    key is the plan's memory hazard. Pin (a) output correctness for a
    1 M-event whale (exact row counts, exact volume sums, exactly one
    first-touch row on the (ts, event_id) argmin), and (b) the whale
    observability contract: whale_obs reports max_user_batch = 1 M so a
    driver can alert before the buffer grows toward executor memory."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.operators.reference_ops import (
        aum_routing,
    )

    n = 1_000_000
    # whale: user 7, 1M events after the watermark, delta = 1.5 on every
    # row (value 2.0, bonded 0.5); two normal users for contrast
    base = datetime.datetime(2024, 1, 16)
    whale = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.lit(base) + F.make_interval(secs=F.col("id"))).alias("ts"),
        F.lit(7).alias("user_id"),
        F.lit("purchase").alias("event_type"),
        F.lit(2.0).alias("value"),
        F.lit('{"k": 0.5}').alias("props"),
    )
    normals = spark.range(n, n + 2).select(
        F.col("id").alias("event_id"),
        (F.lit(base) + F.make_interval(secs=F.col("id") - n)).alias("ts"),
        F.col("id").alias("user_id"),
        F.lit("purchase").alias("event_type"),
        F.lit(3.0).alias("value"),
        F.lit('{"k": 3.0}').alias("props"),
    )
    events = whale.unionByName(normals)

    obs = Observation()
    out = aum_routing(
        events, watermark="2024-01-15 00:00:00", whale_obs=obs
    )
    agg = {
        (r["sink"]): (r["n"], r["vol"])
        for r in out.groupBy("sink")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("volume"), 6).alias("vol"))
        .collect()
    }
    # whale: every odd event_id -> kusama nominations(1.5); every even ->
    # polkadot amountstaked(1.5); every row -> aum(2.0 first, 1.5 after).
    # normals: delta == 0 -> nominations(3.0) + first-touch aum(3.0) each.
    assert agg["nominations"] == (n // 2 + 2, round(1.5 * (n // 2) + 6.0, 6))
    assert agg["amountstaked"] == (n // 2, round(1.5 * (n // 2), 6))
    assert agg["aum"] == (n + 2, round(1.5 * (n - 1) + 2.0 + 6.0, 6))
    # exactly one whale first-touch row, on the (ts, event_id) argmin
    firsts = out.filter(
        (F.col("sink") == "aum") & (F.col("volume") == 2.0)
    ).collect()
    assert len(firsts) == 1 and firsts[0]["event_id"] == 0
    got = obs.get
    assert got["max_user_batch"] == n
    assert got["n_users"] == 3
