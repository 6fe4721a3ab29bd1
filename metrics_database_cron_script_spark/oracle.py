"""Local oracle-differential harness (mirrors the driver's correctness gate).

Runs a registered Spark query and its DuckDB oracle SQL over the same parquet
fixtures and compares row count + column set + order-insensitive values.
Values are canonicalized to strings (floats via repr → bitwise-exact compare;
the query contract rounds float aggregates identically on both sides, so
exact equality is the expectation, not a tolerance)."""

from __future__ import annotations

import datetime
import math
from typing import Any

_MIDNIGHT = datetime.time(0, 0, 0)

import duckdb
import pandas as pd

from metrics_database_cron_script_spark.sources.tables import TABLES, table_path


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for name in TABLES:
        p = table_path(sf_dir, name)
        if os.path.isdir(p):
            # presplit multi-file layout (sources/presplit.py) — same rows
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
        )
    return con


def _canon_cell(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        # DuckDB's .df() surfaces DATE as midnight datetime64 while Spark
        # surfaces DateType as datetime.date; render midnight timestamps as
        # dates on BOTH sides so the comparison is representation-neutral.
        if v.time() == _MIDNIGHT and v.tzinfo is None:
            return v.date().isoformat()
        return v.isoformat()
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> dict[str, Any]:
    spdf = spark_df.toPandas()
    result: dict[str, Any] = {
        "rows_spark": len(spdf),
        "rows_oracle": len(oracle_pdf),
        "cols_spark": sorted(spdf.columns),
        "cols_oracle": sorted(oracle_pdf.columns),
    }
    result["rows_match"] = result["rows_spark"] == result["rows_oracle"]
    result["cols_match"] = result["cols_spark"] == result["cols_oracle"]
    if result["rows_match"] and result["cols_match"]:
        a, b = canonicalize(spdf), canonicalize(oracle_pdf)
        result["values_match"] = a == b
        if not result["values_match"]:
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            result["first_diffs"] = diffs[:5]
    else:
        result["values_match"] = False
    result["ok"] = bool(result["rows_match"] and result["cols_match"] and result["values_match"])
    return result


def check_query(spark, sf_dir: str, name: str) -> dict[str, Any]:
    from metrics_database_cron_script_spark.plans import QUERIES, ORACLES

    sdf = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        n = sdf.count()
        return {"ok": n >= 0, "rows_spark": n, "rows_only": True}
    con = duckdb_connect(sf_dir)
    try:
        opdf = con.execute(ORACLES[name]).df()
    finally:
        con.close()
    return compare(sdf, opdf)
