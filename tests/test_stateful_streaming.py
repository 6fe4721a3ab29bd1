from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_stateful_running_totals_matches_batch(spark):
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.streaming.stateful import (
        run_stateful_running_totals,
    )

    got = {
        r["user_id"]: (r["n"], r["total"])
        for r in run_stateful_running_totals(spark, SF_SMOKE, "t_stateful").collect()
    }
    events = load_table(spark, SF_SMOKE, "events")
    want = {
        r["user_id"]: (r["n"], r["total"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .collect()
    }
    # The stateful path emits Python round(total, 6) (HALF_EVEN); the batch
    # oracle uses F.round (HALF_UP). At an exact .5 tie at the 7th decimal
    # the two legitimately differ by 1e-6, so compare with that tolerance
    # instead of exact equality (round-7 verdict: .5-tie audit).
    assert set(got) == set(want) and len(got) > 0
    for uid in got:
        assert got[uid][0] == want[uid][0], uid
        assert abs(got[uid][1] - want[uid][1]) <= 1e-6 + 1e-12, (
            uid, got[uid][1], want[uid][1],
        )


def test_running_totals_dispatch_matches_batch(spark):
    """The stateful running-totals surface must produce batch-groupBy
    totals on WHICHEVER engine path the environment supports — the
    transformWithStateInPandas runtime where protobuf is present, else the
    applyInPandasWithState implementation. No skip: the dispatch itself is
    asserted, and on a protobuf-less container the direct TWS entry point
    must refuse with actionable guidance rather than dying in the python
    worker."""
    import pytest

    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.streaming.tws import (
        run_running_totals_best,
        run_tws_running_totals,
        tws_available,
    )
    from tests.conftest import SF_SMOKE

    result, path = run_running_totals_best(spark, SF_SMOKE, "t_tws_best")
    assert path == (
        "transformWithState" if tws_available() else "applyInPandasWithState"
    )
    got = {r["user_id"]: (r["n"], r["total"]) for r in result.collect()}
    want = {
        r["user_id"]: (r["n"], r["total"])
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .collect()
    }
    # Tolerance, not equality: HALF_EVEN (stateful emission) vs HALF_UP
    # (F.round oracle) differ by exactly 1e-6 at a .5 tie.
    assert set(got) == set(want) and len(got) > 0
    for uid in got:
        assert got[uid][0] == want[uid][0], uid
        assert abs(got[uid][1] - want[uid][1]) <= 1e-6 + 1e-12, (
            uid, got[uid][1], want[uid][1],
        )

    if not tws_available():
        with pytest.raises(ImportError, match="google.protobuf"):
            run_tws_running_totals(spark, SF_SMOKE, "t_tws_direct")


def test_stateful_totals_multibatch_matches_batch_and_crosses_batches(spark):
    """The multi-micro-batch drain must (a) agree with the batch GROUP BY
    on every user's count and max-ts, and (b) actually build state across
    batches — at least some users must have emitted in more than one
    micro-batch (update-mode emits once per batch that touches the key)."""
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.streaming.stateful import (
        run_stateful_running_totals_multibatch,
    )
    from tests.conftest import SF_SMOKE

    got = {
        r["user_id"]: (r["n"], r["last_ts"])
        for r in run_stateful_running_totals_multibatch(
            spark, SF_SMOKE, "t_totals_mb"
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], r["last_ts"])
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.col("ts").cast("timestamp")).alias("last_ts"),
        )
        .collect()
    }
    assert got == want and len(got) > 0

    # cross-batch evidence from the raw update-mode sink
    raw = spark.table("t_totals_mb")
    multi = raw.groupBy("user_id").count().filter(F.col("count") > 1).count()
    assert multi > 0, "no user spanned more than one micro-batch"
