#!/usr/bin/env python
"""Decompose the daily dedup `edge_refresh` wall at the decade corpus
(round-11 / round-10-verdict item 2: 171.8 s = 61% of the SFXL daily wall,
previously one opaque number).

Reuses bench_daily_sfxl's exact batch/corpus split and the shared
`build_fastpath_state` builder, then noop-materializes each intermediate
frame exposed by `refresh_verified_star_edges(_stages=...)` — same lazy
plans the production refresh executes, timed one sub-DAG at a time.
Stage walls OVERLAP (each sub-DAG recomputes its inputs; the batch
signature pipeline is deliberately unmaterialized per the docstring), so
the attribution reads as "cost of everything up to and including X".

Usage:
    python bench_edge_refresh_decomp.py [--decade DIR] [--out FILE]

Writes one JSON object (default BENCH_EDGE_REFRESH_DECOMP.json) and prints
it; bench_daily_sfxl.py carries the headline per-stage rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_daily_sfxl import DOC_STRIDE  # noqa: E402


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _cpu_canary() -> float:
    """Single-thread matmul canary (same probe as bench.py's noise
    controls): this host shows intermittent 2-25× slowdowns invisible to
    the guest, so every decomposition run brackets itself — compare runs
    only when their canaries match."""
    import numpy as np

    rng = np.random.default_rng(42)
    a = rng.standard_normal((512, 512))
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        b = a
        for _ in range(20):
            b = b @ a
            b /= np.abs(b).max()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 4)


def main() -> None:
    args = list(sys.argv[1:])
    here = os.path.dirname(os.path.abspath(__file__))
    decade_dir = os.path.join(here, ".bench_cache", "sfxl-docs")
    out_path = os.path.join(here, "BENCH_EDGE_REFRESH_DECOMP.json")
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

    from bench_neardup_sfxl import build_fastpath_state, state_provenance
    from metrics_database_cron_script_spark import get_spark
    from metrics_database_cron_script_spark.functions import dedup as D
    from metrics_database_cron_script_spark.sources.tables import load_table

    spark = get_spark("bench_edge_refresh_decomp")
    spark.sparkContext.setLogLevel("ERROR")

    ddocs = load_table(spark, decade_dir, "documents").select(
        "doc_id", "text", "source"
    )
    batch_lo = (
        ddocs.agg(F.max("doc_id")).collect()[0][0] // DOC_STRIDE
    ) * DOC_STRIDE
    corpus = ddocs.filter(F.col("doc_id") < batch_lo)
    batch = ddocs.filter(F.col("doc_id") >= batch_lo)
    n_corpus, n_batch = corpus.count(), batch.count()

    vstate = os.path.join(here, ".bench_cache", "decade-vstate")
    provenance = {
        "decade_dir": os.path.realpath(decade_dir),
        "corpus_filter": f"doc_id < {batch_lo}",
        "corpus_docs": n_corpus,
    }
    out: dict = {
        "metric": "edge_refresh_decomposition",
        "decade_dir": decade_dir,
        "corpus_docs": n_corpus,
        "batch_docs": n_batch,
    }
    if (
        not os.path.isdir(os.path.join(vstate, "edges"))
        or state_provenance(vstate) != provenance
    ):
        out["state_build"] = build_fastpath_state(
            spark, corpus, vstate, provenance=provenance
        )
    bands = spark.read.parquet(os.path.join(vstate, "bands"))
    store = spark.read.parquet(os.path.join(vstate, "store"))
    edges = spark.read.parquet(os.path.join(vstate, "edges"))
    out["state_rows"] = {
        "bands": bands.count(),
        "store": store.count(),
        "edges": edges.count(),
    }

    out["cpu_canary_pre_s"] = _cpu_canary()
    sc = spark.sparkContext
    stages: dict = {}
    # timed: the refresh call eagerly materializes its O(batch) decision
    # relations, so the call itself is part of every full-refresh wall
    sc.setJobDescription("decomp: refresh call (eager decision relations)")
    t0 = time.perf_counter()
    refreshed = D.refresh_verified_star_edges(
        bands, store, edges, batch, _stages=stages
    )
    call_wall = round(time.perf_counter() - t0, 3)

    # raw-input scan floors first (page cache warm-up is shared by all legs)
    walls: dict[str, float] = {}
    for name, df in (
        ("floor_scan_edges", edges),
        ("floor_scan_store", store),
        ("floor_scan_bands", bands),
    ):
        sc.setJobDescription(f"decomp: {name}")
        walls[name] = _noop(df)

    order = [
        # old (bucket-level recompute) stage names, kept so the script can
        # decompose a pre-round-11 checkout for A/B
        "members", "hubs", "candidate_edges", "reuse_hits", "reuse_misses",
        "untouched",
        # round-11 carry-forward stage names
        "batch_bands",   # batch shingle+signature+banding pipeline
        "touched",       # distinct touched bucket keys
        "old_hubs",      # per-touched-bucket min doc_id (map-combined agg)
        "new_members",   # batch postings not already in the index
        "displaced",     # buckets whose hub moved (empty when monotone)
        "new_edges",     # (hub, new member) unscored edges
        "new_pairs",     # distinct new pairs
        "store_needed",  # shingle store semi-joined to new-pair endpoints
        "verified",      # exact Jaccard over new pairs
        "carried",       # prior edges outside displaced buckets
    ]
    for name in order:
        df = stages.get(name)
        if df is None:
            continue
        sc.setJobDescription(f"decomp: {name}")
        walls[name] = _noop(df)
    walls["refresh_call"] = call_wall
    sc.setJobDescription("decomp: full refresh (noop)")
    walls["full_refresh_noop"] = round(_noop(refreshed) + call_wall, 3)
    scratch = os.path.join(here, ".bench_cache", "decomp-edges-next")
    import shutil

    shutil.rmtree(scratch, ignore_errors=True)
    # the parquet-write wall REBUILDS the refresh (fresh call, fresh
    # eager decision relations) so it measures the true end-to-end daily
    # cost, not a noop-warmed rerun
    sc.setJobDescription("decomp: full refresh (call + parquet write)")
    t0 = time.perf_counter()
    refreshed2 = D.refresh_verified_star_edges(bands, store, edges, batch)
    refreshed2.write.parquet(scratch)
    walls["full_refresh_parquet_write"] = round(time.perf_counter() - t0, 3)
    sc.setJobDescription(None)
    out["stage_walls_s"] = walls
    rows: dict[str, int] = {}
    for name in (
        "touched", "members", "candidate_edges", "reuse_hits",
        "old_hubs", "new_members", "displaced", "new_edges",
        "new_pairs", "store_needed", "untouched", "carried",
    ):
        if name in stages:
            rows[name] = stages[name].count()
    rows["refreshed"] = spark.read.parquet(scratch).count()
    out["stage_rows"] = rows
    out["cpu_canary_post_s"] = _cpu_canary()
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
