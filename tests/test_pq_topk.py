"""Product-quantization ANN (functions/similarity.py pq_*): encode/decode
round trip, recall against the exact scan, determinism, and plan hygiene
(pure expressions — no UDF rows, no extra shuffle in the encoder)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metrics_database_cron_script_spark.functions import similarity as S
from tests.conftest import SF_SMOKE


def _emb(spark):
    from metrics_database_cron_script_spark.sources import load_table

    return load_table(spark, SF_SMOKE, "embeddings")


def _queries(spark, n=10):
    emb = _emb(spark)
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def test_pq_encode_decode_bounds_reconstruction_error(spark):
    """Codes must reconstruct to SOME centroid of each subspace codebook,
    and quantization must shrink the representation: 8 int codes per
    vector versus 64 floats, with bounded reconstruction distance."""
    emb = _emb(spark)
    books = S.pq_codebooks(emb, m=8, codes=16, seed=42)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    coded = emb.select(
        "vec_id",
        "embedding",
        S.pq_encode(F.col("embedding"), books).alias("code"),
    ).withColumn("approx", S.pq_decode(F.col("code"), books))
    row = coded.first()
    assert len(row["code"]) == 8
    assert all(0 <= c < 16 for c in row["code"])
    assert len(row["approx"]) == len(row["embedding"])
    # mean reconstruction error must be far below the mean vector norm —
    # i.e. the codebook actually fits the data, not noise
    err = coded.select(
        F.aggregate(
            F.zip_with(
                "embedding", "approx", lambda a, b: (a.cast("double") - b) ** 2
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("se"),
        F.aggregate(
            F.transform("embedding", lambda a: a.cast("double") ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("norm2"),
    ).agg(F.avg("se").alias("mse"), F.avg("norm2").alias("mnorm")).collect()[0]
    assert err["mse"] < err["mnorm"] * 0.9


def test_pq_topk_recall_beats_random_and_is_deterministic(spark):
    """Recall@5 of the PQ shortlist+re-rank against the exact scan must be
    far above the random baseline (5/500 = 1%), and two runs must agree
    exactly (fixed seeds, deterministic tie-breaks)."""
    emb = _emb(spark)
    q = _queries(spark)
    exact = {
        (r["q_id"], r["vec_id"])
        for r in S.brute_force_topk(emb, q, k=5).collect()
    }
    got1 = S.pq_topk(emb, q, k=5)
    pairs1 = {(r["q_id"], r["vec_id"]) for r in got1.collect()}
    recall = len(pairs1 & exact) / len(exact)
    assert recall >= 0.2, f"recall {recall} vs exact scan"
    pairs2 = {
        (r["q_id"], r["vec_id"]) for r in S.pq_topk(emb, q, k=5).collect()
    }
    assert pairs1 == pairs2
    # contract shape: k rows per query, cosine in [-1, 1]
    counts = got1.groupBy("q_id").count().collect()
    assert all(r["count"] == 5 for r in counts)
    assert got1.filter((F.col("cos") > 1.0001) | (F.col("cos") < -1.0001)).count() == 0


def test_pq_encoder_is_pure_expression(spark):
    """The encoder adds no shuffle and no Python rows: its plan must be
    scan → project only (the property that lets it run as one codegen'd
    pass over 100 TB)."""
    emb = _emb(spark).select("vec_id", "embedding")
    books = S.pq_codebooks(emb, m=8, codes=16, seed=42)
    coded = emb.select("vec_id", S.pq_encode(F.col("embedding"), books).alias("c"))
    plan = coded._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
