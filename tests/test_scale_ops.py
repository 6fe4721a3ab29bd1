"""Scale-path operators: salted joins, bucketed co-located joins,
partitioned sink layout."""

from __future__ import annotations

import shutil

from tests.conftest import SF_SMOKE


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.operators.skew import salted_join
    from metrics_database_cron_script_spark.sources import load_table

    events = load_table(spark, SF_SMOKE, "events")
    # per-user dim (15 hot users — the skew shape)
    dim = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_events"))
    plain = events.join(dim, "user_id").select("event_id", "user_events")
    salted = salted_join(events, dim, key="user_id", salt_id_col="event_id").select(
        "event_id", "user_events"
    )
    assert plain.subtract(salted).count() == 0
    assert salted.subtract(plain).count() == 0
    assert salted.count() == plain.count()


def test_salted_join_semi_anti(spark):
    """The docstring declares left_semi/left_anti sound — they must be
    accepted and match the plain join; right/full outer stay rejected."""
    import pytest
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.operators.skew import salted_join
    from metrics_database_cron_script_spark.sources import load_table

    events = load_table(spark, SF_SMOKE, "events")
    dim = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 400)
        .select("user_id")
    )
    for how in ("left_semi", "leftsemi", "left_anti"):
        plain = events.join(dim, "user_id", how).select("event_id")
        salted = salted_join(
            events, dim, key="user_id", salt_id_col="event_id", how=how
        ).select("event_id")
        assert salted.subtract(plain).count() == 0
        assert plain.subtract(salted).count() == 0
    for bad in ("right", "full_outer", "cross"):
        with pytest.raises(ValueError):
            salted_join(events, dim, key="user_id", salt_id_col="event_id", how=bad)


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """bucketBy co-location: a join between two tables bucketed on the join
    key plans WITHOUT a shuffle exchange on either side."""
    from metrics_database_cron_script_spark.sources import load_table

    # warehouse dir is a static conf — bucketed tables land in the default
    # ./spark-warehouse (gitignored) and are dropped in finally.
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    customer.write.bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
    # at fixture scale the planner would broadcast and skip bucketing — force
    # the large-large path this layout exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            spark.table("b_orders")["o_custkey"] == spark.table("b_customer")["c_custkey"],
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_partitioned_sink_layout(spark, tmp_path):
    """Fact-table layout for the 100 TB story (SURVEY.md §7.0): partitioned
    by chain + day → partition pruning visible in the scan plan."""
    import os

    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.operators.reference_ops import tx_view
    from metrics_database_cron_script_spark.sources import load_table

    out = str(tmp_path / "facts")
    tx = tx_view(load_table(spark, SF_SMOKE, "events")).withColumn(
        "day", F.to_date("ts")
    )
    tx.write.partitionBy("chain", "day").mode("overwrite").parquet(out)
    assert os.path.isdir(f"{out}/chain=polkadot")

    pruned = spark.read.parquet(out).filter(
        (F.col("chain") == "polkadot") & (F.col("day") == "2024-01-03")
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    n_total = spark.read.parquet(out).count()
    assert pruned.count() < n_total
    # partition filters must prune at planning time, not post-scan
    assert "PartitionFilters: [" in plan and "chain" in plan.split("PartitionFilters")[1][:200]


def test_aqe_skew_join_splits_hot_partition(spark):
    """The session factory enables AQE skew-join splitting; prove the
    mechanism fires: a join keyed 95% on one hot key, with the skew
    thresholds scaled down to fixture size, must show isSkew=true in the
    final adaptive plan."""
    from pyspark.sql import functions as F

    confs = {
        # pin AQE on: the engine's scale gate (sources/tables.py) disables it
        # session-wide when a fixture-sized dir was loaded earlier in the run
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(0, 50).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        joined = big.join(dim, "k")
        # execute THIS DataFrame's plan (count() would finalize a different
        # AdaptiveSparkPlan and leave joined's at isFinalPlan=false)
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
