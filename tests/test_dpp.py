"""Dynamic partition pruning (DPP) evidence: a directory-partitioned fact
scan joined to a filtered dim must be pruned at RUNTIME by the dim's
matching keys — asserted on both the physical plan (dynamicpruning
subquery on the scan's partition filters) and the executed scan's
`numPartitions` metric, not just on plan text.

This is the third leg of the at-scale scan story next to AQE
(tests/test_aqe_skew.py) and stats-envelope skipping (tests/test_layout.py):
directory pruning is the only one of the three that eliminates listing +
IO for partitions the QUERY (not the writer) decides are dead, which is
what makes `clustered_write(partition_cols=[...])`'s layout pay off on a
date-partitioned 100 TB fact table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metrics_database_cron_script_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE, set_confs


def _scan_nodes(plan):
    """All FileSourceScanExec nodes in a (non-adaptive) executed plan."""
    out = []
    if plan.getClass().getSimpleName() == "FileSourceScanExec":
        out.append(plan)
    for i in range(plan.children().size()):
        out.extend(_scan_nodes(plan.children().apply(i)))
    return out


def _metric(node, name):
    m = node.metrics()
    return m.apply(name).value() if m.contains(name) else None


@pytest.fixture(scope="module")
def month_partitioned_orders(spark, tmp_path_factory):
    """orders re-laid-out as a date-partitioned fact: one directory per
    order month (the clustered_write partition_cols path)."""
    from metrics_database_cron_script_spark.operators.layout import (
        clustered_write,
    )

    out = str(tmp_path_factory.mktemp("dpp") / "orders_by_month")
    o = load_table(spark, SF_SMOKE, "orders").withColumn(
        "om", F.date_format("o_orderdate", "yyyy-MM")
    )
    clustered_write(
        o, out, cluster_cols=["o_orderkey"], n_files=2, partition_cols=["om"]
    )
    return out


def test_dpp_prunes_fact_partitions(spark, month_partitioned_orders):
    fact = spark.read.parquet(month_partitioned_orders)
    total_months = fact.select("om").distinct().count()
    dim = (
        fact.select("om")
        .distinct()
        .withColumn("yr", F.substring("om", 1, 4))
    )
    months_1995 = dim.filter(F.col("yr") == "1995").count()
    assert 0 < months_1995 < total_months  # pruning has something to prune

    with set_confs(
        spark,
        **{
            # DPP works with or without AQE; keep the executed plan a plain
            # tree so the scan node and its metrics are directly reachable
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
        },
    ):
        q = (
            fact.join(dim.filter(F.col("yr") == "1995"), "om")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_totalprice").alias("vol"),
            )
        )
        [row] = q.collect()
        jplan = q._jdf.queryExecution().executedPlan()
        plan_str = jplan.toString()

        # 1. the fact scan carries a runtime pruning subquery
        assert "dynamicpruning" in plan_str, plan_str[:2000]

        # 2. the executed scan READ only the dim's surviving partitions
        parted = [
            s
            for s in _scan_nodes(jplan)
            if _metric(s, "numPartitions") is not None
        ]
        assert parted, "no partitioned scan node found"
        read = min(_metric(s, "numPartitions") for s in parted)
        assert read == months_1995, (read, months_1995, total_months)

    # 3. result identical to the statically-filtered plan
    static = fact.filter(F.substring("om", 1, 4) == "1995").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("vol")
    )
    [srow] = static.collect()
    assert row["n"] == srow["n"]
    assert abs(row["vol"] - srow["vol"]) < 1e-6


def test_dpp_empty_dim_prunes_everything(spark, month_partitioned_orders):
    """A dim filter matching nothing must prune every fact partition —
    the scan does zero IO instead of scanning 100 TB for an empty join."""
    fact = spark.read.parquet(month_partitioned_orders)
    dim = fact.select("om").distinct()
    with set_confs(
        spark,
        **{
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
        },
    ):
        q = fact.join(dim.filter(F.col("om") == "2099-01"), "om").select(
            "o_orderkey"
        )
        assert q.collect() == []
        jplan = q._jdf.queryExecution().executedPlan()
        parted = [
            s
            for s in _scan_nodes(jplan)
            if _metric(s, "numPartitions") is not None
        ]
        assert parted and min(_metric(s, "numPartitions") for s in parted) == 0
