"""AQE runtime re-planning evidence: skew-join splitting and partition
coalescing actually FIRE, asserted on the post-execution adaptive plan.

The engine gates AQE on dataset footprint (sources/tables.py: ≥4 GiB —
below that the per-stage re-planning round costs more than it recovers).
These tests force the gate open on a deliberately skewed in-memory dataset
with the skew thresholds scaled to MB data, which exercises the SAME
mechanism (OptimizeSkewedJoin / AQEShuffleRead) a 100 TB run relies on —
the at-scale artifact (BENCH_COMPARE_SFXL.json, ≥4 GiB via
`gen_sfxl.py --skew-mod`) measures it with production-default thresholds.

Also covers gen_sfxl's --skew-mod contract: hot-key rows must keep FK
integrity (the hot key exists in replica 0) so skewed joins stay CORRECT,
not just skewed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE, set_confs


def _skewed_frames(spark):
    # left: 400k rows, half of them on ONE key -> one shuffle partition
    # carries ~200x the median; right: uniform dim over the same key space
    left = spark.range(0, 400_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id") % 997)
        .alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    right = spark.range(0, 997).select(
        F.col("id").alias("k"), F.lit("dim").alias("tag")
    )
    return left, right


def test_aqe_splits_skewed_join_partitions(spark):
    """A hot join key must trigger OptimizeSkewedJoin: the final adaptive
    plan's sort-merge join carries skew=true and the job completes with the
    exact join cardinality (splitting changes the schedule, never the
    result)."""
    left, right = _skewed_frames(spark)
    with set_confs(
        spark,
        **{
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.shuffle.partitions": "16",
            # production defaults are 256 MB / factor 5 — scale the byte
            # thresholds to MB-sized test data, keep the factor semantics
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
        },
    ):
        joined = left.join(right, "k")
        # drain THIS DataFrame's own query execution (count() would spawn a
        # separate one whose adaptive plan never finalizes)
        assert len(joined.collect()) == 400_000
        final = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final, f"no skew split in final plan:\n{final[:2000]}"


def test_aqe_coalesces_tiny_shuffle_partitions(spark):
    """The inverse adaptation: 64 statically-planned shuffle partitions over
    KB-scale data must coalesce at runtime (AQEShuffleRead coalesced) —
    the mechanism that lets the engine start shuffles fine-grained at
    100 TB and let the runtime own the final width."""
    with set_confs(
        spark,
        **{
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.shuffle.partitions": "64",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64MB",
        },
    ):
        df = (
            spark.range(0, 10_000)
            .groupBy((F.col("id") % 100).alias("g"))
            .agg(F.sum("id").alias("s"))
        )
        assert len(df.collect()) == 100
        final = df._jdf.queryExecution().executedPlan().toString()
    assert "coalesced" in final, f"no AQE coalesce in final plan:\n{final[:2000]}"


@pytest.fixture(scope="module")
def skewed_dir(tmp_path_factory):
    from gen_sfxl import replicate

    out = str(tmp_path_factory.mktemp("sfxl") / "skewed")
    replicate(SF_SMOKE, out, 4, skew_mod=8)
    return out


def test_skew_mod_concentrates_hot_key_and_keeps_fk(spark, skewed_dir):
    """--skew-mod must (a) concentrate ~1/mod of replica rows on ONE key and
    (b) keep that hot key joinable (it exists in the orders/base side), so
    the skewed fact join loses no rows."""
    from metrics_database_cron_script_spark.oracle import duckdb_connect

    con = duckdb_connect(skewed_dir)
    top, cnt = con.execute(
        "SELECT l_orderkey, COUNT(*) c FROM lineitem GROUP BY 1 ORDER BY c DESC LIMIT 1"
    ).fetchone()
    total = con.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    # 3 of 4 replicas redirect ~1/8 of their rows onto the hot key
    assert cnt > total / 16, (top, cnt, total)
    # FK integrity: the hot key joins — zero dangling lineitem rows
    dangling = con.execute(
        "SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o "
        "ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL"
    ).fetchone()[0]
    assert dangling == 0
    # the skewed fact join in Spark returns the exact DuckDB cardinality
    from metrics_database_cron_script_spark.sources.tables import load_table

    li = load_table(spark, skewed_dir, "lineitem")
    o = load_table(spark, skewed_dir, "orders")
    got = li.join(o, li["l_orderkey"] == o["o_orderkey"]).count()
    want = con.execute(
        "SELECT COUNT(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
    ).fetchone()[0]
    assert got == want
