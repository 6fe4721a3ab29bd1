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


def test_histogram_quantile_merge_exact_and_bounded(spark):
    """The histogram rollup's defining guarantees: merged day histograms
    equal the direct global histogram EXACTLY (integer vector addition),
    and each interpolated percentile sits within one bin width of the
    true percentile (the estimator's worst case by construction)."""
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.plans import QUERIES
    from metrics_database_cron_script_spark.sources import load_table

    rows = {
        r["q"]: r
        for r in QUERIES["c_histogram_quantile_merge"](spark, SF_CORRECT).collect()
    }
    assert set(rows) == {0.5, 0.9, 0.99}
    assert all(r["merged_eq_direct"] for r in rows.values())

    ev = load_table(spark, SF_CORRECT, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).collect()[0]
    bin_w = (hi - lo) / 256
    exact = ev.agg(
        *[F.expr(f"percentile(value, {q})").alias(str(q)) for q in rows]
    ).collect()[0]
    for q, r in rows.items():
        assert abs(r["est"] - exact[str(q)]) <= bin_w, (q, r["est"], exact[str(q)])
