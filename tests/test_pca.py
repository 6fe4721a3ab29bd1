"""PCA tests: the library eigensolve (pca_top_component) against direct
numpy PCA, and the ORACLED fixed-start power-iteration variant
(pca_scores_power, registered as x_embed_pca_scores since round 10) —
spec differential, moment-rounding margin certification, and the DuckDB
value oracle."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE


def test_eigensolve_pca_scores_match_numpy(spark):
    """The library eigensolve path must match a direct numpy PCA on the
    same parquet (same sign convention) to float-sum tolerance."""
    from metrics_database_cron_script_spark.functions.similarity import (
        pca_top_component,
    )
    from metrics_database_cron_script_spark.sources import load_table

    got = {
        int(r["vec_id"]): float(r["pc1_score"])
        for r in pca_top_component(
            load_table(spark, SF_SMOKE, "embeddings")
        ).collect()
    }
    df = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mean = m.mean(axis=0)
    cov = (m.T @ m) / len(m) - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    top = vecs[:, int(np.argmax(vals))]
    nz = np.nonzero(np.abs(top) > 1e-12)[0]
    if len(nz) and top[nz[0]] < 0:
        top = -top
    want = (m - mean) @ top
    ids = df["vec_id"].astype(int).to_numpy()
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        assert abs(got[vid] - want[i]) < 1e-4, (vid, got[vid], want[i])


def test_power_pca_matches_independent_python_replay(spark):
    """The registered power variant must equal an INDEPENDENT pure-python
    replay of its spec (6-dp HALF_UP moments → 64 left-assoc matvec +
    normalize iterations from the sha256 start → centered projection) to
    the last 6-dp digit — the same determinism the DuckDB oracle relies
    on, pinned engine-side."""
    from metrics_database_cron_script_spark.functions.similarity import (
        pca_power_start,
    )
    from metrics_database_cron_script_spark.plans import QUERIES

    got = {
        int(r["vec_id"]): float(r["pc1_score"])
        for r in QUERIES["x_embed_pca_scores"](spark, SF_SMOKE).collect()
    }
    df = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    n, dim = m.shape

    def r6(x):
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

    mu = [r6(float(x) / n) for x in m.sum(axis=0)]
    m2 = [r6(float(x) / n) for x in (m.T @ m).reshape(-1)]
    v = pca_power_start(dim)
    for _ in range(64):
        dm = 0.0
        for j in range(dim):
            dm = dm + mu[j] * v[j]
        w = []
        for i in range(dim):
            acc = 0.0
            for j in range(dim):
                acc = acc + m2[i * dim + j] * v[j]
            w.append(acc - mu[i] * dm)
        norm = 0.0
        for x in w:
            norm = norm + x * x
        norm = norm**0.5
        v = [x / norm for x in w]
    first = next((x for x in v if abs(x) > 1e-6), 1.0)
    if first < 0:
        v = [-x for x in v]
    ids = df["vec_id"].astype(int).to_numpy()
    for i, vid in enumerate(ids):
        acc = 0.0
        for j in range(dim):
            acc = acc + (float(m[i, j]) - mu[j]) * v[j]
        assert got[vid] == r6(acc), (vid, got[vid], r6(acc))


def test_power_pca_moment_rounding_margins_certified():
    """The ONE cross-engine nondeterminism in the power variant is float
    summation order in the moment sums (~1e-12 wobble). Certify that no
    moment of any fixture lands within 1e-4 rounding quanta (1e-10
    absolute) of its 6-dp boundary, so Spark/numpy and DuckDB always
    round to the same grid point — the precondition the oracle's bitwise
    replay rests on."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        df = pd.read_parquet(f"/root/testdata/{sf}/embeddings.parquet")
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        n = len(m)
        vals = np.concatenate([(m.T @ m).reshape(-1) / n, m.sum(axis=0) / n])
        frac = np.abs(vals) * 1e6
        margin = np.abs(frac - np.floor(frac) - 0.5).min()
        assert margin > 1e-4, (sf, margin)


def test_pca_scores_capture_max_variance_direction(spark):
    """PC1 variance must dominate the per-coordinate variances."""
    from metrics_database_cron_script_spark.plans import QUERIES

    scores = np.array(
        [
            float(r["pc1_score"])
            for r in QUERIES["x_embed_pca_scores"](spark, SF_SMOKE).collect()
        ]
    )
    df = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    assert scores.var() >= m.var(axis=0).max() - 1e-9


def test_pca_power_query_matches_oracle(spark):
    from metrics_database_cron_script_spark.oracle import check_query

    res = check_query(spark, SF_SMOKE, "x_embed_pca_scores")
    assert res["ok"], res
