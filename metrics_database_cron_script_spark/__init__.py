"""metrics_database_cron_script_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference cron ETL (``yieldscan/metrics-database-cron-script``,
see ``SURVEY.md``), widened to a full relational + streaming + LLM-data-pipeline
operator surface.

Design stance (SURVEY.md §7.0):
- declarative DataFrame/SQL plans; Catalyst/AQE pick physical strategy
- columnar Parquet at rest, Arrow in flight; no per-row RPCs anywhere
- broadcast small dims, anti-join idempotent sinks, window-function state
- pandas UDFs only where built-ins can't express the semantics
"""

__version__ = "0.1.0"

from metrics_database_cron_script_spark.session import get_spark  # noqa: F401
