"""Runtime bloom-filter join pruning evidence — the shuffle-join sibling
of dynamic partition pruning (tests/test_dpp.py): when one side of a
shuffle join is selectively filtered, Catalyst injects a bloom filter
built from that side's join keys into the OTHER side's scan, so the big
side drops non-joining rows before the shuffle instead of shipping them.
This is the planner-automatic counterpart of the explicit, reusable
sketch in functions/bloom.py (which exists for the cross-batch case the
optimizer can't see)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import set_confs


@pytest.fixture(scope="module")
def fact_dim(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("rtf")
    spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.parquet(str(d / "fact"))
    spark.range(0, 5_000).select(
        F.col("id").alias("k"), F.lit("dim").alias("t")
    ).write.parquet(str(d / "dim"))
    return str(d / "fact"), str(d / "dim")


def _join(spark, fact_dim):
    fact_path, dim_path = fact_dim
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("k") % 50 == 0)
    return fact.join(dim, "k")


def test_bloom_filter_injected_below_threshold(spark, fact_dim):
    """With the application-side threshold scaled to the fixture (the
    production default is 10 GiB — this test exercises the same mechanism
    a 100 TB scan relies on), the filtered dim's keys must reach the fact
    scan as a bloom probe, and the join result must be unaffected."""
    with set_confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "1KB",
            "spark.sql.optimizer.runtime.bloomFilter."
            "creationSideThreshold": "10MB",
        },
    ):
        q = _join(spark, fact_dim)
        optimized = q._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in optimized, optimized[:2000]
        assert "might_contain" in optimized, optimized[:2000]
        n = q.count()
    assert n == 100  # 5000 dim keys, every 50th survives the filter


def test_no_injection_at_production_threshold(spark, fact_dim):
    """Negative control: at the default 10 GiB application-side threshold
    a KB-scale scan must NOT pay the bloom build — the optimizer only
    spends a subquery job when the protected scan is big enough to repay
    it."""
    with set_confs(
        spark,
        **{"spark.sql.autoBroadcastJoinThreshold": "-1"},
    ):
        q = _join(spark, fact_dim)
        optimized = q._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" not in optimized
