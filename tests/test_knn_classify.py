"""Differential test for x_knn_label_majority: the distributed hold-out
k-NN classifier must exactly reproduce a straightforward numpy
implementation on the same parquet — same neighbors (after the 6-decimal
cosine round and (cos desc, vec_id) tie-break the Spark side uses), same
majority vote, same smallest-label tie-break."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE

K = 5
MOD = 10


def _numpy_expected(sf_dir: str) -> dict[int, tuple[int, int]]:
    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = np.stack(df["embedding"].to_numpy())
    ids = df["vec_id"].to_numpy()
    labels = df["label"].to_numpy()
    held = ids % MOD == 0
    out = {}
    rest_ids, rest_vecs, rest_labels = ids[~held], vecs[~held], labels[~held]
    rest_norm = np.linalg.norm(rest_vecs, axis=1)
    for qi in np.nonzero(held)[0]:
        cos = rest_vecs @ vecs[qi] / (rest_norm * np.linalg.norm(vecs[qi]))
        cos = np.round(cos, 6)
        order = sorted(range(len(rest_ids)), key=lambda j: (-cos[j], rest_ids[j]))
        top = order[:K]
        votes: dict[int, int] = {}
        for j in top:
            votes[rest_labels[j]] = votes.get(rest_labels[j], 0) + 1
        best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out[int(ids[qi])] = (int(best[0]), int(best[1]))
    return out


def test_knn_majority_matches_numpy(spark):
    from metrics_database_cron_script_spark.plans import QUERIES

    got = {
        int(r["q_id"]): (int(r["predicted_label"]), int(r["n_votes"]))
        for r in QUERIES["x_knn_label_majority"](spark, SF_SMOKE).collect()
    }
    assert got == _numpy_expected(SF_SMOKE)


def test_knn_true_labels_carried(spark):
    from metrics_database_cron_script_spark.plans import QUERIES

    df = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    truth = dict(zip(df["vec_id"].astype(int), df["label"].astype(int)))
    rows = QUERIES["x_knn_label_majority"](spark, SF_SMOKE).collect()
    assert rows and all(truth[int(r["q_id"])] == int(r["true_label"]) for r in rows)
