"""Cron-equivalent CLI: one incremental batch run of the five pipelines.

Usage:
    python -m metrics_database_cron_script_spark.run \
        [--sf-dir /root/testdata/sf0.001] [--state-dir ./state]

Prints the run report as one JSON line (rows appended per sink, watermark
movement). Re-running is a no-op by construction (idempotent sinks +
strict-greater watermark) — the property the reference approximates with
per-row existence probes.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--state-dir", default="./state")
    args = ap.parse_args()

    from metrics_database_cron_script_spark import get_spark
    from metrics_database_cron_script_spark.pipelines import run_batch

    spark = get_spark("metrics_database_cron_script_spark.run")
    report = run_batch(spark, args.sf_dir, args.state_dir)
    print(json.dumps({k: str(v) for k, v in report.items()}))


if __name__ == "__main__":
    main()
