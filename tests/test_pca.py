"""Differential test for x_embed_pca_scores: the mapInPandas moment
aggregation + driver eigensolve must match a direct numpy PCA on the same
parquet (same sign convention) to float-sum tolerance."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE


def test_pca_scores_match_numpy(spark):
    from metrics_database_cron_script_spark.plans import QUERIES

    got = {
        int(r["vec_id"]): float(r["pc1_score"])
        for r in QUERIES["x_embed_pca_scores"](spark, SF_SMOKE).collect()
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
