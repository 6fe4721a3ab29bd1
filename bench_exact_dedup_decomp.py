#!/usr/bin/env python
"""Decompose the daily exact-dedup step at the decade corpus and A/B the
bloom backstop strategies (round 12: the daily artifact's exact_dedup_s
read ~24 s in both r12 runs vs 12.5 s in the r10-era artifact; this bench
isolates the step with canary brackets and measures the old shuffle
backstop against the new broadcast backstop IN THE SAME SESSION by forcing
`_BACKSTOP_BCAST_MAX = 0` for the "old" leg).

Reuses bench_daily_sfxl's exact corpus/batch split; the seen-hash set is
rebuilt exactly like the daily bench's day-0 step.

Usage:
    python bench_exact_dedup_decomp.py [--decade DIR] [--out FILE]

Writes one JSON object (default BENCH_EXACT_DEDUP_DECOMP.json).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_daily_sfxl import DOC_STRIDE  # noqa: E402
from bench_edge_refresh_decomp import _cpu_canary  # noqa: E402


def main() -> None:
    args = list(sys.argv[1:])
    here = os.path.dirname(os.path.abspath(__file__))
    decade_dir = os.path.join(here, ".bench_cache", "sfxl-docs")
    out_path = os.path.join(here, "BENCH_EXACT_DEDUP_DECOMP.json")
    if "--decade" in args:
        i = args.index("--decade")
        decade_dir = args[i + 1]
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark import get_spark
    from metrics_database_cron_script_spark.functions import bloom as B
    from metrics_database_cron_script_spark.functions import dedup as D
    from metrics_database_cron_script_spark.sources.tables import load_table

    spark = get_spark("bench_exact_dedup_decomp")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    ddocs = load_table(spark, decade_dir, "documents").select(
        "doc_id", "text", "source"
    )
    batch_lo = (
        ddocs.agg(F.max("doc_id")).collect()[0][0] // DOC_STRIDE
    ) * DOC_STRIDE
    corpus = ddocs.filter(F.col("doc_id") < batch_lo)
    batch = ddocs.filter(F.col("doc_id") >= batch_lo)
    n_corpus = corpus.count()

    out: dict = {
        "metric": "exact_dedup_decomposition",
        "decade_dir": decade_dir,
        "corpus_docs": n_corpus,
        "batch_docs": batch.count(),
    }
    out["cpu_canary_pre_s"] = _cpu_canary()

    scratch = tempfile.mkdtemp(prefix="exact_dedup_decomp_")
    seen_path = os.path.join(scratch, "seen-hashes")
    try:
        t0 = time.perf_counter()
        corpus.select(F.xxhash64(D.normalized_text()).alias("h")).distinct(
        ).write.parquet(seen_path)
        out["seen_build_s"] = round(time.perf_counter() - t0, 3)

        def run_leg(label: str, backstop_max: int) -> dict:
            """One full exact-dedup step, fresh frames, forced backstop."""
            sc.setJobDescription(f"exact dedup leg: {label}")
            saved = B._BACKSTOP_BCAST_MAX
            B._BACKSTOP_BCAST_MAX = backstop_max
            try:
                t0 = time.perf_counter()
                batch_keys = batch.select(
                    "doc_id", F.xxhash64(D.normalized_text()).alias("h")
                )
                seen = spark.read.parquet(seen_path)
                fresh = B.bloom_pruned_anti_join(
                    batch_keys, seen.select(F.col("h")), key="h",
                    expected_items=max(1, n_corpus),
                )
                n_fresh = fresh.count()
                wall = round(time.perf_counter() - t0, 3)
            finally:
                B._BACKSTOP_BCAST_MAX = saved
            return {"wall_s": wall, "fresh_rows": n_fresh}

        # warm page cache on the seen parquet once so the A/B compares
        # compute, not first-touch disk IO (the daily's cold-IO share is
        # visible as the delta between run 1 below and the daily artifact)
        legs = {}
        legs["broadcast_backstop_run1_coldio"] = run_leg(
            "broadcast backstop (cold IO)", B._BACKSTOP_BCAST_MAX
        )
        legs["shuffle_backstop"] = run_leg("shuffle backstop (old shape)", 0)
        legs["broadcast_backstop"] = run_leg(
            "broadcast backstop", 500_000
        )
        legs["shuffle_backstop_run2"] = run_leg(
            "shuffle backstop (repeat)", 0
        )
        out["legs"] = legs
        sc.setJobDescription(None)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    out["cpu_canary_post_s"] = _cpu_canary()
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
