#!/usr/bin/env python
"""ANN (embedding similarity) at decade scale (round-7 verdict item 4).

The embedding family's instruments (x_ann_recall, IVF/SQ/PQ) run at sf0.1
— ~2 000 vectors. This measures the same operators at 10 M vectors ×
64 dims: brute-force exact top-k as the baseline (wall = the cost an
index must beat), IVF index build (coarse k-means quantizer fit on a
sample + one assignment pass + cell-partitioned parquet), and the probe
at several n_probe settings with recall@k measured against the exact
truth — the embedding twin of BENCH_NEARDUP_SFXL.json.

Corpus: deterministic clustered vectors — 1 024 unit centers (fixed-seed
gaussian) + per-id splitmix64 noise, so vec_id alone reproduces every
vector (no RNG state to ship) and the corpus has the cluster structure
IVF exists to exploit. Queries are 100 corpus vectors (self excluded
from every top-k, so their true neighbors are their cluster-mates).

The probe question SCALE.md needs answered: is probe cost
O(batch + probed-cell membership) like the minhash/star probes — i.e.
does the wall track probed_rows, not corpus size? The per-n_probe rows
(probed_rows, wall_s) measure exactly that, and the cell-partitioned
layout turns the probe's cell filter into static partition pruning (the
scan reads n_probe directories per query set, not 10 M rows).

Usage:
    python bench_ann_sfxl.py [--vectors N] [--regen]

Writes BENCH_ANN_SFXL.json; per-phase rows stream to stderr.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_VECTORS = 10_000_000
DIM = 64
N_CLUSTERS = 1024
SIGMA = 0.10  # noise norm^2 ~ 0.2 of the unit center: real cluster structure
# (0.35 made noise DOMINATE the center - same-cluster cosine ~0.28, no
# structure for IVF to exploit; measured recall@10 was 0.09 at n_probe=1)
N_QUERIES = 100
K = 10
N_CELLS = 256
SEED = 7


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def _dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dn, fs in os.walk(d)
        for f in fs
    )


def _centers():
    import numpy as np

    rng = np.random.default_rng(SEED)
    c = rng.standard_normal((N_CLUSTERS, DIM))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _splitmix_unit(x):
    """Vectorized splitmix64 → floats in [-1, 1). Deterministic per input
    uint64 — the corpus needs no RNG state, only vec_id."""
    import numpy as np

    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return (z >> np.uint64(11)).astype(np.float64) / float(1 << 53) * 2.0 - 1.0


def bench_vectors(ids):
    """(n,) int64 vec_ids → (n, DIM) float32: cluster center + noise."""
    import numpy as np

    centers = _centers()
    ids = np.asarray(ids, dtype=np.int64)
    cell = (ids * 2654435761) % N_CLUSTERS
    base = (ids[:, None].astype(np.uint64) * np.uint64(DIM)) + np.arange(
        DIM, dtype=np.uint64
    )[None, :]
    noise = _splitmix_unit(base)
    return (centers[cell] + SIGMA * noise).astype(np.float32)


def _gen_vecs(batches):
    import pandas as pd

    for pdf in batches:
        ids = pdf["vec_id"].to_numpy()
        mat = bench_vectors(ids)
        yield pd.DataFrame({"vec_id": ids, "embedding": list(mat)})


def main() -> None:
    args = sys.argv[1:]
    n_vectors = N_VECTORS
    if "--vectors" in args:
        i = args.index("--vectors")
        n_vectors = int(args[i + 1])
        del args[i : i + 2]
    regen = "--regen" in args

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    import numpy as np
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark import get_spark
    from metrics_database_cron_script_spark.functions import similarity as S

    spark = get_spark("bench_ann_sfxl")
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.abspath(__file__))
    vec_dir = os.path.join(here, ".bench_cache", "sfxl-vectors")
    index_dir = os.path.join(here, ".bench_cache", "ann-ivf-index")

    out: dict = {
        "metric": "ann_sfxl",
        "vectors": n_vectors,
        "dim": DIM,
        "clusters": N_CLUSTERS,
        "queries": N_QUERIES,
        "k": K,
        "cpus": os.cpu_count(),
    }

    def _phase(key: str, obj) -> None:
        out[key] = obj
        print(json.dumps({key: obj}), file=sys.stderr, flush=True)

    # ---- corpus ------------------------------------------------------------
    if regen or not os.path.isdir(vec_dir):
        shutil.rmtree(vec_dir, ignore_errors=True)
        ids = spark.range(n_vectors).select(F.col("id").alias("vec_id")).repartition(256)
        _, wall = _timed(
            lambda: ids.mapInPandas(
                _gen_vecs, schema="vec_id long, embedding array<float>"
            ).write.parquet(vec_dir)
        )
        _phase("ann_corpus_gen", {
            "vectors": n_vectors,
            "wall_s": wall,
            "bytes": _dir_bytes(vec_dir),
        })
    else:
        _phase("ann_corpus_gen", {"reused": True, "bytes": _dir_bytes(vec_dir)})

    corpus = spark.read.parquet(vec_dir)
    corpus.count()  # warm footers/page cache: compare plans, not caches

    q_ids = [i * (n_vectors // N_QUERIES) for i in range(N_QUERIES)]
    queries = corpus.filter(F.col("vec_id").isin(q_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )

    # ---- exact brute force: the baseline an index must beat ----------------
    bf, wall_bf = _timed(
        lambda: S.brute_force_topk(corpus, queries, k=K).collect()
    )
    truth: dict[int, set] = {}
    for r in bf:
        truth.setdefault(r["q_id"], set()).add(r["vec_id"])
    _phase("ann_brute_force", {
        "wall_s": wall_bf,
        "rows": len(bf),
        "vectors_scored_per_s": round(n_vectors * N_QUERIES / wall_bf, 1),
        "note": "exact top-%d over all %d vectors for %d queries (Arrow "
        "matmul scan, local top-k per partition, tiny final window)"
        % (K, n_vectors, N_QUERIES),
    })

    # ---- IVF index build ----------------------------------------------------
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus_v = corpus.withColumn("__vec", array_to_vector("embedding"))
    mod = max(1, n_vectors // 4096)
    fit_set = corpus_v.filter(
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(mod)) == 0
    )
    t0 = time.perf_counter()
    model = KMeans(
        k=N_CELLS, seed=42, featuresCol="__vec", predictionCol="__cell"
    ).fit(fit_set.select("__vec"))
    wall_fit = round(time.perf_counter() - t0, 3)
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.perf_counter()
    (
        model.transform(corpus_v)
        .select("vec_id", "embedding", F.col("__cell").alias("cell"))
        # one shuffle so each cell directory is ONE file: without it every
        # upstream task writes a file per cell (256 tasks x 256 cells ~
        # 65k tiny files, measured to slow the probe scan ~5x)
        .repartition("cell")
        .write.partitionBy("cell")
        .parquet(index_dir)
    )
    wall_assign = round(time.perf_counter() - t0, 3)
    _phase("ann_ivf_build", {
        "n_cells": N_CELLS,
        "fit_sample_rows": fit_set.count(),
        "fit_s": wall_fit,
        "assign_write_s": wall_assign,
        "total_s": round(wall_fit + wall_assign, 3),
        "index_bytes": _dir_bytes(index_dir),
        "layout": "parquet partitionBy(cell): the probe's cell filter is "
        "static partition pruning — n_probe directories read per query "
        "set, not the corpus",
    })

    # ---- probe at several n_probe settings ---------------------------------
    centers = np.asarray(model.clusterCenters(), dtype=np.float64)
    q_pd = queries.toPandas()
    q_mat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in q_pd["q_vec"]]
    )
    d2 = ((q_mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    assigned = spark.read.parquet(index_dir)
    probe_rows = []
    for n_probe in (1, 4, 16):
        order = np.argsort(d2, axis=1)[:, :n_probe]
        qc = [
            (int(q_pd["q_id"][i]), [float(x) for x in q_pd["q_vec"][i]], int(c))
            for i in range(len(q_pd))
            for c in order[i]
        ]
        q_cells = spark.createDataFrame(
            qc, "q_id long, q_vec array<float>, cell int"
        )
        probed_cells = sorted({c for _, _, c in qc})
        probed = assigned.filter(F.col("cell").isin(probed_cells))
        n_probed_rows = probed.count()
        pairs = probed.join(F.broadcast(q_cells), "cell").select(
            "q_id", "q_vec", "vec_id", "embedding"
        )
        got, wall_probe = _timed(
            lambda: S.arrow_pair_topk(pairs, k=K).collect()
        )
        by_q: dict[int, set] = {}
        for r in got:
            by_q.setdefault(r["q_id"], set()).add(r["vec_id"])
        recalls = [
            len(by_q.get(q, set()) & t) / len(t) for q, t in truth.items()
        ]
        row = {
            "n_probe": n_probe,
            "probed_cells": len(probed_cells),
            "probed_rows": n_probed_rows,
            "probed_fraction": round(n_probed_rows / n_vectors, 4),
            # the serving-cost number: a single query probes ~n_probe
            # cells; the batch-aggregate fraction above is 100 queries'
            # distinct-cell union, not what one lookup pays
            "probed_rows_per_query": round(n_probed_rows / N_QUERIES, 1),
            "wall_s": wall_probe,
            "recall_at_%d" % K: round(float(np.mean(recalls)), 4),
            "speedup_vs_brute": round(wall_bf / wall_probe, 2),
        }
        probe_rows.append(row)
        print(json.dumps({"ann_ivf_probe": row}), file=sys.stderr, flush=True)
    out["ann_ivf_probe"] = probe_rows

    # ---- the batched-query scan: per-cell matmul probe ----------------------
    # The pair-join probe above duplicates each query vector onto every
    # candidate row — measured SLOWER than brute-force matmul at 10 M
    # vectors despite scanning 3× less data. ivf_probe_matmul reads each
    # probed row once and scores it against exactly the queries probing
    # its cell with one BLAS matmul per (partition, cell) — the
    # FAISS-style inverted-list scan (equality with the pair scorer
    # pinned by tests/test_dedup_quality.py).
    centers_arr = np.asarray(model.clusterCenters(), dtype=np.float64)
    matmul_rows = []
    for n_probe in (1, 4, 16):
        order = np.argsort(d2, axis=1)[:, :n_probe]
        probed_cells = sorted({int(c) for row_ in order for c in row_})
        n_probed_rows = assigned.filter(
            F.col("cell").isin(probed_cells)
        ).count()
        got, wall_probe = _timed(
            lambda: S.ivf_probe_matmul(
                assigned, queries, centers_arr, k=K, n_probe=n_probe
            ).collect()
        )
        by_q = {}
        for r in got:
            by_q.setdefault(r["q_id"], set()).add(r["vec_id"])
        recalls = [
            len(by_q.get(q, set()) & t) / len(t) for q, t in truth.items()
        ]
        row = {
            "n_probe": n_probe,
            "probed_cells": len(probed_cells),
            "probed_rows": n_probed_rows,
            "probed_fraction": round(n_probed_rows / n_vectors, 4),
            "probed_rows_per_query": round(n_probed_rows / N_QUERIES, 1),
            "wall_s": wall_probe,
            "recall_at_%d" % K: round(float(np.mean(recalls)), 4),
            "speedup_vs_brute": round(wall_bf / wall_probe, 2),
        }
        matmul_rows.append(row)
        print(
            json.dumps({"ann_ivf_probe_matmul": row}),
            file=sys.stderr,
            flush=True,
        )
    out["ann_ivf_probe_matmul"] = matmul_rows

    with open(os.path.join(here, "BENCH_ANN_SFXL.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
