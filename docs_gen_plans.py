#!/usr/bin/env python
"""Regenerate PLANS.md — formatted physical plans of the headline queries at
sf0.1, the evidence that pushdown/broadcast/codegen actually happen. Run
after changing operators."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from bench import HEADLINE
    from metrics_database_cron_script_spark import get_spark
    from metrics_database_cron_script_spark.plans import QUERIES

    spark = get_spark("plans", shuffle_partitions=8)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = [
        "# Headline query plans (sf0.1)",
        "",
        "`executedPlan` for each bench query — where to look: `PushedFilters`",
        "(scan pruning), `BroadcastHashJoin`/`BroadcastExchange` (dim joins),",
        "`*(n)` prefixes (whole-stage codegen spans), exchange count (shuffles).",
        "",
    ]
    for name in HEADLINE:
        plan = (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        out += [f"## {name}", "", "```", plan.rstrip()[:6000], "```", ""]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md: {len(HEADLINE)} plans")


if __name__ == "__main__":
    main()
