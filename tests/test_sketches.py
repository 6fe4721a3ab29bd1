"""Mergeable-sketch guarantees (c_hll_daily_merge): unioning per-day HLL
sketches must equal the direct single-pass sketch (the property that makes
pre-aggregated sketch rollups SOUND, not just fast), and both must sit
within HLL's error envelope of the exact distinct count."""

from __future__ import annotations

from tests.conftest import SF_CORRECT


def test_union_of_daily_sketches_equals_direct(spark):
    from metrics_database_cron_script_spark.plans import QUERIES
    from metrics_database_cron_script_spark.sources import load_table

    row = QUERIES["c_hll_daily_merge"](spark, SF_CORRECT).collect()[0]
    assert row["n_days"] == 30
    assert row["est_union"] == row["est_direct"]  # mergeability, exactly

    exact = load_table(spark, SF_CORRECT, "events").select("user_id").distinct().count()
    assert abs(row["est_union"] - exact) / exact < 0.05
