#!/usr/bin/env python
"""Round-over-round drift attribution: interleaved A/B of the ROUND-3 plans
against the CURRENT plans in ONE Spark session (round-5 verdict item 4).

BENCH_r04 drifted +7% over BENCH_r03 with 13/19 queries slower on unrelated
families — consistent with machine load (min/max noise is 2-4×) but
unattributed. Separate-session comparisons cannot separate load from plan
regressions; this harness can: both registries' DataFrames execute
interleaved (r3, r5, r3, r5 … alternating which goes first per round), so
any load spike hits both sides of every comparison equally.

Mechanics: the round-3 close commit is materialized as a git worktree
(.bench_cache/r3snap ← d99617d). Its package is imported under a swapped
sys.path/sys.modules window and every headline plan is BUILT while its own
tree is active (query bodies lazy-import package modules — building later
would silently mix trees); the r5 plans build from the normal tree after
the swap is unwound. Execution (queryExecution drain via .count()) is pure
JVM and needs no Python module context, so the interleave only touches
prebuilt DataFrames. Session confs are re-pinned per side before each
drain iff the two trees' load_table sized them differently.

Timing = bench.py's own metric on the steady state (count() on the
registry-cached plan, min over rounds).

Round 6 adds per-query job/task counts for BOTH sides (verdict item 4):
an interleaved delta now decomposes into "structure changed (jobs/tasks
moved, floor moved with it)" vs "identical structure -> load/floor noise".

Usage: python bench_drift_ab.py [rounds]      # default 7
Writes one JSON line (committed as BENCH_DRIFT_AB.json).
"""

from __future__ import annotations

import importlib
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from bench import HEADLINE, bench_dir  # noqa: E402

PKG = "metrics_database_cron_script_spark"
R3_COMMIT = "d99617d"  # "round 3: verdict/advice/correctness/bench"
R3_ROOT = os.path.join(HERE, ".bench_cache", "r3snap")

# confs load_table sizes per dataset — re-pinned per side when they differ
SIZED_CONFS = [
    "spark.sql.shuffle.partitions",
    "spark.sql.files.maxPartitionBytes",
    "spark.sql.files.openCostInBytes",
    "spark.sql.adaptive.enabled",
]


def _swap_out_pkg() -> dict:
    out = {}
    for k in list(sys.modules):
        if k == PKG or k.startswith(PKG + "."):
            out[k] = sys.modules.pop(k)
    return out


def build_tree_plans(root: str, spark, sf_dir: str, queries: list[str]):
    """Import `root`'s package in an isolated module window and build all
    query DataFrames while it is active (lazy in-function imports resolve
    against sys.modules at CALL time — the build must finish inside the
    window). Returns ({name: DataFrame}, {conf: value}, kept_modules)."""
    saved = _swap_out_pkg()
    sys.path.insert(0, root)
    try:
        plans = importlib.import_module(PKG + ".plans")
        dfs = {name: plans.QUERIES[name](spark, sf_dir) for name in queries}
        confs = {c: spark.conf.get(c) for c in SIZED_CONFS}
    finally:
        sys.path.remove(root)
        kept = _swap_out_pkg()  # keep the tree's modules alive for closures
        sys.modules.update(saved)
    return dfs, confs, kept


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    if not os.path.isdir(R3_ROOT):
        subprocess.run(
            ["git", "worktree", "add", R3_ROOT, R3_COMMIT],
            cwd=HERE,
            check=True,
        )
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from metrics_database_cron_script_spark import get_spark

    spark = get_spark("bench_drift_ab")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = bench_dir(src)

    # x_near_dup_minhash changed banding deliberately in round 5 (tuner
    # default 16x4 → 8x2): it is not the same operator anymore, so it is
    # compared but flagged. c_multi_join / c_tpch_q9_shape /
    # x_near_dup_minhash changed PLANS deliberately in round 6 (inlined
    # constant dims, size-carry through banding) with identical output —
    # those comparisons are exactly the point.
    changed_semantics = {"x_near_dup_minhash"}

    r3_dfs, r3_confs, _keep3 = build_tree_plans(R3_ROOT, spark, sf_dir, HEADLINE)
    r5_dfs, r5_confs, _keep5 = build_tree_plans(HERE, spark, sf_dir, HEADLINE)
    confs_differ = r3_confs != r5_confs

    def drain(df) -> float:
        t0 = time.perf_counter()
        assert df.count() >= 0
        return time.perf_counter() - t0

    def jobs_tasks(df, tag: str) -> tuple[int, int]:
        """Plan-structural job/task counts of one drain (round-6 verdict
        item 4: a +15 ms delta must decompose into 'extra job/stage' vs
        'noise'). Counting itself lives in bench.count_jobs_tasks so the
        rules cannot drift between this artifact and BENCH_COMPARE."""
        from bench import count_jobs_tasks

        sc = spark.sparkContext
        sc.setJobGroup(tag, "drift-attrib")
        try:
            df.count()
            return count_jobs_tasks(spark, tag)
        except Exception:
            return -1, -1
        finally:
            sc.setJobGroup("", "")

    # warm both sides untimed (codegen, page cache, first-materialization)
    for name in HEADLINE:
        drain(r3_dfs[name])
        drain(r5_dfs[name])

    times: dict[str, dict[str, list[float]]] = {
        n: {"r3": [], "r5": []} for n in HEADLINE
    }
    for i in range(rounds):
        order = ("r3", "r5") if i % 2 == 0 else ("r5", "r3")
        for name in HEADLINE:
            for side in order:
                if confs_differ:
                    for c, v in (r3_confs if side == "r3" else r5_confs).items():
                        spark.conf.set(c, v)
                times[name][side].append(
                    drain((r3_dfs if side == "r3" else r5_dfs)[name])
                )

    out_q = {}
    tot3 = tot5 = 0.0
    for name in HEADLINE:
        b3 = min(times[name]["r3"])
        b5 = min(times[name]["r5"])
        tot3 += b3
        tot5 += b5
        j3, t3 = jobs_tasks(r3_dfs[name], f"attrib-r3-{name}")
        j5, t5 = jobs_tasks(r5_dfs[name], f"attrib-cur-{name}")
        if j3 >= 0 and j5 >= 0:
            if (j5, t5) == (j3, t3):
                attrib = "identical job/task structure -> delta is load/floor noise"
            else:
                attrib = (
                    f"structure changed: jobs {j3}->{j5}, tasks {t3}->{t5} "
                    "(fixed-cost floor moved with it)"
                )
        else:
            attrib = "statusTracker unavailable"
        out_q[name] = {
            "r3_s": round(b3, 3),
            "cur_s": round(b5, 3),
            "ratio_cur_over_r3": round(b5 / b3, 3) if b3 > 0 else None,
            "regressed_gt_10pct": b5 > 1.1 * b3,
            "r3_jobs": j3,
            "r3_tasks": t3,
            "cur_jobs": j5,
            "cur_tasks": t5,
            "attribution": attrib,
            **(
                {"note": "banding retuned in r5 (different operator)"}
                if name in changed_semantics
                else {}
            ),
        }
    print(
        json.dumps(
            {
                "metric": "drift_ab_r3_vs_current",
                "protocol": "one session, prebuilt plans, interleaved "
                "drains, alternating order per round, min-of-rounds",
                "r3_commit": R3_COMMIT,
                "rounds": rounds,
                "sf_dir": sf_dir,
                "sized_confs_differ": confs_differ,
                "r3_confs": r3_confs,
                "r5_confs": r5_confs,
                "total_r3_s": round(tot3, 3),
                "total_current_s": round(tot5, 3),
                "total_ratio": round(tot5 / tot3, 3),
                "regressed": sorted(
                    n
                    for n, q in out_q.items()
                    if q["regressed_gt_10pct"] and n not in changed_semantics
                ),
                "queries": out_q,
            }
        )
    )


if __name__ == "__main__":
    main()
