"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Everything is delegated to ``metrics_database_cron_script_spark`` — the query
contract lives in ``metrics_database_cron_script_spark/plans/`` (one module
per SURVEY.md §2.C family), each entry registered with its oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: r_tx_enrich — the reference's
    economically central computation (tx dollar value, updatescript.py:69-82)
    as one scan → broadcast-join → CASE-projection plan."""
    from metrics_database_cron_script_spark.plans import QUERIES

    return QUERIES["r_tx_enrich"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from metrics_database_cron_script_spark.plans import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from metrics_database_cron_script_spark.plans import all_oracles

    return all_oracles()
