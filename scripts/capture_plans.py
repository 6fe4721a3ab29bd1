#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into plans/<round>/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
Writes plans/<round>/<query>_<suffix>.txt for each query (default: the
bench HEADLINE list); the round dir defaults to r11 and is overridden with
SPARK_GRAFT_PLANS_DIR=r12. Plan capture is timing-insensitive; safe under
load."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, bench_dir  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from metrics_database_cron_script_spark import get_spark
    from metrics_database_cron_script_spark.plans import QUERIES

    spark = get_spark("capture-plans")
    sf_dir = bench_dir(src_dir)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r11"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
