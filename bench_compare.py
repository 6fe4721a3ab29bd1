#!/usr/bin/env python
"""Transparency tool: per-query Spark-vs-DuckDB timing on the headline set
(DuckDB on the identical parquet is BASELINE.md's ≤2× yardstick). Prints one
JSON line with both columns and the ratio. Rows-only queries (no oracle SQL)
report ratio=null.

Context for reading the ratios: DuckDB has ~0 per-query overhead while local
Spark pays job scheduling + codegen per action; the gap closes as data grows
and inverts on a cluster. PLANS.md documents that the Spark plans themselves
are shuffle-minimal."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, bench_dir, run_query  # noqa: E402


def main() -> None:
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from metrics_database_cron_script_spark import get_spark
    from metrics_database_cron_script_spark.oracle import duckdb_connect
    from metrics_database_cron_script_spark.plans import ORACLES, QUERIES

    spark = get_spark("bench_compare")
    sf_dir = bench_dir(src_dir)  # both engines read the same presplit copy
    for name in HEADLINE:
        QUERIES[name](spark, "/root/testdata/sf0.001").count()  # warm codegen
    for name in HEADLINE:
        QUERIES[name](spark, sf_dir).count()  # JIT/page-cache warm at target sf

    con = duckdb_connect(sf_dir)
    out = {}
    agg_s = agg_d = 0.0
    for name in HEADLINE:
        r = run_query(spark, QUERIES[name], sf_dir, runs=5)
        best_s = r["s"]
        if name in ORACLES:
            best_d = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                con.execute(ORACLES[name]).fetchall()
                best_d = min(best_d, time.perf_counter() - t0)
            agg_s += best_s
            agg_d += best_d
            out[name] = {
                "spark_s": best_s,
                "spark_max_s": r["max_s"],
                "spark_jobs": r["jobs"],
                "duckdb_s": round(best_d, 3),
                "ratio": round(best_s / best_d, 1) if best_d > 0 else None,
            }
        else:
            out[name] = {
                "spark_s": best_s,
                "spark_max_s": r["max_s"],
                "spark_jobs": r["jobs"],
                "duckdb_s": None,
                "ratio": None,
            }
    print(
        json.dumps(
            {
                "metric": "spark_vs_duckdb",
                "sf": sf_dir,
                "layout": "presplit" if sf_dir != src_dir else "raw",
                "aggregate_ratio": round(agg_s / agg_d, 2) if agg_d > 0 else None,
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
