#!/usr/bin/env python
"""Decompose the daily dedup `connected_components` wall at the decade
corpus (round-12 / round-11-verdict item 3: components_s = 42.5 s is the
dominant daily-dedup line post-edge-refresh-rewrite, previously one opaque
number).

Reuses the refreshed edge state the edge-refresh decomposition bench wrote
(`.bench_cache/decomp-edges-next`, 48.6 M rows — regenerate with
bench_edge_refresh_decomp.py if absent), thresholds it exactly like
bench_daily_sfxl.py does, and times `connected_components` end to end plus
its internal phases via the `_walls` hook (the phases end at real eager
sync points — localCheckpoint / count — so the walls are sequential, not
overlapping).

Usage:
    python bench_components_decomp.py [--edges DIR] [--out FILE]

Writes one JSON object (default BENCH_COMPONENTS_DECOMP.json) and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_edge_refresh_decomp import _cpu_canary  # noqa: E402


def main() -> None:
    args = list(sys.argv[1:])
    here = os.path.dirname(os.path.abspath(__file__))
    edges_dir = os.path.join(here, ".bench_cache", "decomp-edges-next")
    out_path = os.path.join(here, "BENCH_COMPONENTS_DECOMP.json")
    if "--edges" in args:
        i = args.index("--edges")
        edges_dir = args[i + 1]
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    if not os.path.isdir(edges_dir):
        raise SystemExit(
            f"refreshed edge state not found at {edges_dir} — run "
            "bench_edge_refresh_decomp.py first"
        )

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark import get_spark
    from metrics_database_cron_script_spark.functions import dedup as D

    spark = get_spark("bench_components_decomp")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    out: dict = {"metric": "components_decomposition", "edges_dir": edges_dir}
    out["cpu_canary_pre_s"] = _cpu_canary()

    edges = spark.read.parquet(edges_dir)
    out["edge_state_rows"] = edges.count()

    # the exact daily-bench input shape (bench_daily_sfxl.py daily_dedup
    # step 4): threshold + project + distinct over the persisted state
    def pair_set():
        return (
            edges.filter(F.col("jaccard") >= 0.8)
            .select("doc_a", "doc_b")
            .distinct()
        )

    sc.setJobDescription("components decomp: input pair set (noop)")
    t0 = time.perf_counter()
    pair_set().write.format("noop").mode("overwrite").save()
    out["input_pairs_noop_s"] = round(time.perf_counter() - t0, 3)
    out["input_pairs_rows"] = pair_set().count()

    rounds: list[int] = []
    walls: dict = {}
    sc.setJobDescription("components decomp: connected_components end-to-end")
    t0 = time.perf_counter()
    comps = D.connected_components(
        pair_set(), on_round=rounds.append, _walls=walls
    )
    comp_row = (
        comps.groupBy("component")
        .agg(F.count(F.lit(1)).alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_components"),
            F.max("k").alias("max_cluster"),
        )
        .collect()[0]
    )
    out["components_total_s"] = round(time.perf_counter() - t0, 3)
    sc.setJobDescription(None)
    out["phase_walls_s"] = walls
    out["residual_changed_per_round"] = rounds
    out["n_components"] = comp_row["n_components"]
    out["max_cluster"] = comp_row["max_cluster"]
    out["cpu_canary_post_s"] = _cpu_canary()
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
