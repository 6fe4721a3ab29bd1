"""Bloom-pruned anti-join (functions/bloom.py): no false negatives,
bounded false positives, and exact equivalence to the plain anti-join."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from metrics_database_cron_script_spark.functions.bloom import (
    BloomSketch,
    bloom_params,
    bloom_pruned_anti_join,
    build_bloom,
    might_contain,
)

from tests.conftest import SF_CORRECT


def test_bloom_params_shape():
    m, k = bloom_params(10_000, 0.01)
    assert m % 64 == 0
    # textbook optimum: ~9.59 bits/item, ~7 hashes at 1% fpp
    assert 9 * 10_000 < m < 11 * 10_000
    assert 6 <= k <= 8
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_no_false_negatives(spark):
    keys = spark.range(0, 2_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    sketch = build_bloom(keys, "key", expected_items=2_000, fpp=0.01)
    flagged = might_contain(keys, "key", sketch)
    assert flagged.filter(~F.col("__bloom_maybe")).count() == 0


def test_false_positive_rate_bounded(spark):
    members = spark.range(0, 2_000).select(
        F.concat(F.lit("m"), F.col("id")).alias("key")
    )
    sketch = build_bloom(members, "key", expected_items=2_000, fpp=0.01)
    outsiders = spark.range(0, 10_000).select(
        F.concat(F.lit("x"), F.col("id")).alias("key")
    )
    fp = (
        might_contain(outsiders, "key", sketch)
        .filter(F.col("__bloom_maybe"))
        .count()
    )
    # 1% target; allow generous slack for hash variance on 10k probes
    assert fp / 10_000 < 0.05


def test_partitioning_invariance(spark):
    keys = spark.range(0, 500).select(
        F.concat(F.lit("p"), F.col("id")).alias("key")
    )
    a = build_bloom(keys.repartition(1), "key", 500, 0.01)
    b = build_bloom(keys.repartition(13), "key", 500, 0.01)
    assert a == b  # OR-reduce is order-insensitive


def test_probe_numpy_roundtrip():
    # driver-side sketch math is self-consistent without Spark
    m, k = bloom_params(64, 0.01)
    bits = np.zeros(m // 8, dtype=np.uint8)
    h1 = np.arange(64, dtype=np.uint64) * np.uint64(2654435761)
    h2 = h1 * np.uint64(40503) + np.uint64(1)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        np.bitwise_or.at(
            bits,
            (idx >> np.uint64(3)).astype(np.int64),
            np.left_shift(np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)),
        )
    s = BloomSketch(bits=bits.tobytes(), m=m, k=k)
    assert s.might_contain_np(h1, h2).all()


def test_pruned_anti_join_equals_plain(spark):
    d = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    nt = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    n = d.select("doc_id", "source", nt.alias("nt"))
    existing = n.filter(F.col("doc_id") < 250).select("nt").distinct()
    batch = n.filter(F.col("doc_id") >= 250)
    pruned = bloom_pruned_anti_join(
        batch, existing, "nt", expected_items=existing.count(), fpp=0.01
    ).select("doc_id", "source", "nt")
    plain = batch.join(existing, "nt", "left_anti").select(
        "doc_id", "source", "nt"
    )
    assert pruned.exceptAll(plain).count() == 0
    assert plain.exceptAll(pruned).count() == 0


def test_null_keys_survive(spark):
    existing = spark.createDataFrame([("a",), (None,)], "key string")
    incoming = spark.createDataFrame(
        [("a",), ("b",), (None,)], "key string"
    )
    out = bloom_pruned_anti_join(incoming, existing, "key", 2, 0.01)
    # anti-join null semantics: null key never matches, so it survives
    plain = incoming.join(existing, "key", "left_anti")
    assert sorted(r["key"] for r in plain.collect() if r["key"]) == sorted(
        r["key"] for r in out.collect() if r["key"]
    )
    assert out.filter(F.col("key").isNull()).count() == plain.filter(
        F.col("key").isNull()
    ).count()
