from __future__ import annotations

import os
import shutil
import tempfile

from tests.conftest import SF_SMOKE


def test_stream_band_rows_match_batch_banding(spark):
    """The per-row (no-agg) streaming signature/banding must be
    bit-identical to the batch explode+aggregate portable path — same md5
    hex prefixes, same band signatures, doc for doc."""
    from metrics_database_cron_script_spark.functions.dedup import (
        lsh_bands_portable,
        minhash_signatures_portable,
        word_shingles,
    )
    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.streaming.neardup import band_rows

    docs = load_table(spark, SF_SMOKE, "documents")
    streaming_shape = band_rows(docs)
    batch_shape = lsh_bands_portable(
        minhash_signatures_portable(word_shingles(docs, hashed=False))
    )
    assert streaming_shape.exceptAll(batch_shape).count() == 0
    assert batch_shape.exceptAll(streaming_shape).count() == 0
    assert streaming_shape.count() > 0


def test_streaming_neardup_matches_batch_pipeline(spark):
    """Full stream-executed run (4 micro-batches) ≡ the batch portable
    near-dup pipeline, verified pairs and exact Jaccard included."""
    from metrics_database_cron_script_spark.functions.dedup import (
        minhash_near_dups_portable,
    )
    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.streaming.neardup import (
        run_streaming_neardup,
    )

    got = run_streaming_neardup(spark, SF_SMOKE, "t_sndup_full")
    want = minhash_near_dups_portable(
        load_table(spark, SF_SMOKE, "documents")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0


def test_streaming_neardup_state_crosses_micro_batches(spark):
    """Plant a near-dup pair in two SEPARATE source files: the pair can
    only be found if the first doc's bucket membership survives in the
    state store until the second doc's micro-batch probes it. Also pins
    that the drain really was incremental (≥2 micro-batches) — a
    one-mega-batch drain would pass the equality tests without exercising
    state handoff at all."""
    from pyspark.sql import Row

    from metrics_database_cron_script_spark.streaming.neardup import (
        run_streaming_neardup_on_dir,
    )

    text_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    text_b = text_a + " lambda"  # high-Jaccard near-dup of text_a
    noise = "one two three four five six seven eight nine ten eleven"
    staging = tempfile.mkdtemp(prefix="t_sndup_split_")
    try:
        spark.createDataFrame(
            [Row(doc_id=1, text=text_a), Row(doc_id=2, text=noise)]
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(staging, "f1"))
        spark.createDataFrame(
            [Row(doc_id=3, text=text_b)]
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(staging, "f2"))
        # flatten: move part files up so the dir is one table of 2 files
        flat = tempfile.mkdtemp(prefix="t_sndup_flat_")
        n = 0
        for sub in ("f1", "f2"):
            for f in sorted(os.listdir(os.path.join(staging, sub))):
                if f.endswith(".parquet"):
                    n += 1
                    shutil.copy(
                        os.path.join(staging, sub, f),
                        os.path.join(flat, f"part-{n}.parquet"),
                    )
        assert n == 2
        out = run_streaming_neardup_on_dir(spark, flat, "t_sndup_split")
        rows = out.collect()
        n_batches = rows[0]["__n_batches"] if rows else 0
        pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
        assert n_batches >= 2, f"drained as {n_batches} micro-batch(es)"
        assert (1, 3) in pairs, pairs
        assert not any(2 in p for p in pairs), pairs
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(flat, ignore_errors=True)
