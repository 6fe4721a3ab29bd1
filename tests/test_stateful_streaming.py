from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_stateful_running_totals_matches_batch(spark):
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.streaming.stateful import (
        run_stateful_running_totals,
    )

    got = {
        (r["user_id"], r["n"], r["total"])
        for r in run_stateful_running_totals(spark, SF_SMOKE, "t_stateful").collect()
    }
    events = load_table(spark, SF_SMOKE, "events")
    want = {
        (r["user_id"], r["n"], r["total"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_tws_running_totals_matches_batch(spark):
    """transformWithStateInPandas running totals must equal the batch
    groupBy — skipped where the TWS python runtime can't start (no
    protobuf in this container; see streaming/tws.py gate)."""
    import pytest

    from metrics_database_cron_script_spark.streaming.tws import (
        run_tws_running_totals,
        tws_available,
    )

    if not tws_available():
        pytest.skip("google.protobuf not installed — TWS driver worker cannot start")

    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    got = {
        r["user_id"]: (r["n"], r["total"])
        for r in run_tws_running_totals(spark, SF_SMOKE, "t_tws").collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .collect()
    }
    assert got == want
