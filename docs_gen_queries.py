#!/usr/bin/env python
"""Regenerate QUERIES.md — the full registered-query inventory with oracle
modes, grouped by family. Run after adding queries."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FAMILIES = {
    "r_": "Reference semantics (cron pipelines, SURVEY.md §8)",
    "c_": "Core relational",
    "s_": "Streaming-shaped windows & watermark policy",
    "x_": "LLM-data-pipeline (dedup / similarity / text / multimodal)",
}


def main() -> None:
    from metrics_database_cron_script_spark.plans import ORACLES, QUERIES

    lines = [
        "# Query inventory",
        "",
        f"{len(QUERIES)} registered queries; {len(ORACLES)} SQL-oracled "
        "(DuckDB), the rest rows-only per SURVEY.md §2.C. Every entry is a "
        "`(spark, sf_dir) -> DataFrame` callable in `queries()` "
        "(`__spark_entry__.py`).",
        "",
    ]
    for prefix, title in FAMILIES.items():
        names = sorted(n for n in QUERIES if n.startswith(prefix))
        lines += [f"## {title} ({len(names)})", "", "| query | oracle | summary |", "|---|---|---|"]
        for n in names:
            doc = (QUERIES[n].__doc__ or "").strip().splitlines()
            summary = doc[0].rstrip(".") if doc else ""
            mode = "SQL" if n in ORACLES else "rows-only"
            lines.append(f"| `{n}` | {mode} | {summary} |")
        lines.append("")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "QUERIES.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"QUERIES.md: {len(QUERIES)} queries")


if __name__ == "__main__":
    main()
