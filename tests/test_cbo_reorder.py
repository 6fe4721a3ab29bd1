"""Cost-based join reordering evidence: with catalog statistics
(ANALYZE TABLE) and CBO on, Catalyst rewrites a badly-written join order
so the selective dim reduction runs FIRST — the planner leg of the scale
story next to AQE (runtime), DPP (partition pruning), and runtime bloom
filters (row pruning). At 100 TB the difference between joining the
500k-row fact to the mid table before vs after the selective small-dim
cut is the whole shuffle volume; stats let the optimizer fix a plan the
query author got wrong."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import set_confs


@pytest.fixture(scope="module")
def cbo_tables(spark):
    tables = {
        "cbo_big": spark.range(0, 500_000).selectExpr("id AS k", "id % 1000 AS m"),
        "cbo_mid": spark.range(0, 10_000).selectExpr("id AS k", "id % 50 AS s"),
        "cbo_small": spark.range(0, 50).selectExpr("id AS s", "'x' AS tag"),
    }
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name, df in tables.items():
        # drop both catalog entry and any orphaned location from a
        # previous crashed run — saveAsTable refuses a leftover dir
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        df.write.mode("overwrite").saveAsTable(name)
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS")
    yield list(tables)
    for name in tables:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


_SQL = """
SELECT COUNT(*) AS n FROM cbo_big b
JOIN cbo_mid m ON b.k = m.k
JOIN cbo_small s ON m.s = s.s
WHERE s.s < 5
"""


def _first_rel_positions(plan: str) -> tuple[int, int]:
    return plan.index("cbo_big"), plan.index("cbo_small")


def test_cbo_moves_selective_join_first(spark, cbo_tables):
    with set_confs(
        spark,
        **{
            "spark.sql.cbo.enabled": "true",
            "spark.sql.cbo.joinReorder.enabled": "true",
        },
    ):
        q = spark.sql(_SQL)
        plan = q._jdf.queryExecution().optimizedPlan().toString()
        big_at, small_at = _first_rel_positions(plan)
        # reordered: the (mid ⋈ filtered small) reduction is the inner
        # join, the big fact joins its RESULT — big appears after small
        assert small_at < big_at, plan[:1500]
        n_cbo = q.collect()[0]["n"]

    with set_confs(spark, **{"spark.sql.cbo.enabled": "false"}):
        q2 = spark.sql(_SQL)
        plan2 = q2._jdf.queryExecution().optimizedPlan().toString()
        big_at2, small_at2 = _first_rel_positions(plan2)
        # written order preserved without cost estimates
        assert big_at2 < small_at2, plan2[:1500]
        assert q2.collect()[0]["n"] == n_cbo  # reorder is plan-only


def test_stats_are_actually_recorded(spark, cbo_tables):
    stats = spark.sql("DESCRIBE EXTENDED cbo_big").collect()
    blob = "\n".join(str(r) for r in stats)
    assert "Statistics" in blob and "rows" in blob
