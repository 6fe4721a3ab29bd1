"""Multimodal UDF plumbing: deterministic byte-level stand-ins for
decode/resize/frame-sample, exercised end-to-end through mapInPandas."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_frame_sample_shapes(spark):
    from metrics_database_cron_script_spark.functions.multimodal import (
        blob_table,
        frame_sample,
    )
    from metrics_database_cron_script_spark.sources import load_table

    blobs = blob_table(load_table(spark, SF_SMOKE, "documents").limit(20))
    frames = frame_sample(blobs, frame_size=64, every_k=4).collect()
    assert len(frames) > 0
    assert all(r["frame_idx"] % 4 == 0 for r in frames)
    assert all(len(r["frame"]) <= 64 for r in frames)


def test_resize_bytes_fixed_length(spark):
    from metrics_database_cron_script_spark.functions.multimodal import (
        blob_table,
        resize_bytes,
    )
    from metrics_database_cron_script_spark.sources import load_table

    blobs = blob_table(load_table(spark, SF_SMOKE, "documents").limit(20))
    rows = resize_bytes(blobs, target_bytes=32).collect()
    assert len(rows) == 20
    assert all(len(r["resized"]) == 32 for r in rows)  # fixture docs ≥ 32 bytes
    assert all(r["orig_bytes"] >= 32 for r in rows)


def test_decode_image_is_clearly_stubbed():
    import pytest as _pytest

    from metrics_database_cron_script_spark.functions.multimodal import decode_image

    try:
        import PIL  # noqa: F401

        _pytest.skip("PIL present; stub not exercised")
    except ImportError:
        pass
    with _pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\x89PNG...")


def test_text_ops_survive_tiny_and_empty_docs(spark):
    """Short/empty documents must not crash the char-gram operators
    (negative-length sequence guard)."""
    from metrics_database_cron_script_spark.functions.dedup import (
        char_ngram_jaccard,
        minhash_near_dups,
        word_shingles,
    )
    from metrics_database_cron_script_spark.functions.text import (
        fingerprint,
        quality_score,
    )

    docs = spark.createDataFrame(
        [
            (1, "a", "en", "s0", 1),
            (2, "", "en", "s0", 0),
            (3, "ab cd", "en", "s1", 5),
            (4, "the quick brown fox jumps over the lazy dog again and again", "en", "s1", 60),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert fingerprint(docs).count() >= 1
    assert word_shingles(docs).count() >= 1
    assert char_ngram_jaccard(docs).count() >= 0
    assert minhash_near_dups(docs).count() >= 0
    q = {r["doc_id"]: r["n_words"] for r in quality_score(docs).collect()}
    assert q[2] == 0 and q[4] > 5


def test_quarantine_degenerate_hashes_routes_flat_images(spark):
    """Round-9 verdict item 6: constant images (all-zero/all-one aHash)
    must route to quarantine BEFORE candidate generation — a constructed
    flat image, a white image, and real fixture images through the
    expectations-style gate. Also pins the null-rejecting contract: a
    NULL phash (upstream decode dead-letter) goes to quarantine, never
    into a hash bucket."""
    import numpy as np
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.functions.multimodal import (
        ahash_bits,
        quarantine_degenerate_hashes,
    )

    flat = ahash_bits(np.full((16, 16, 3), 77, dtype=np.uint8))
    assert flat == "0" * 64  # every block mean == global mean -> all zero
    rows = [
        (1, flat),
        (2, "0" * 32 + "1" * 32),  # discriminative
        (3, None),                  # decode dead-letter
    ]
    hashes = spark.createDataFrame(rows, "doc_id long, phash string")
    v = quarantine_degenerate_hashes(hashes)
    good = {r["doc_id"] for r in v.good.collect()}
    quar = {r["doc_id"]: r["violated"] for r in v.quarantined.collect()}
    assert good == {2}
    assert set(quar) == {1, 3}
    assert all(tags == ["discriminative_signature"] for tags in quar.values())
    m = v.metrics()
    assert m["rows"] == 3 and m["discriminative_signature"] == 2


def test_quarantine_empty_shingle_docs_routes_tokenless(spark):
    """TEXT twin: docs whose token set is empty (undefined minhash) are
    quarantined; short-but-tokenized docs stay good (word_shingles still
    emits one truncated shingle for them)."""
    from metrics_database_cron_script_spark.functions.dedup import (
        quarantine_empty_shingle_docs,
        word_shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, "a solid document with several words"),
            (2, "hi"),            # short but tokenized -> good
            (3, "!!! ... ???"),   # no alnum tokens -> quarantine
            (4, ""),              # empty -> quarantine
        ],
        "doc_id long, text string",
    )
    v = quarantine_empty_shingle_docs(docs)
    good = {r["doc_id"] for r in v.good.collect()}
    quar = {r["doc_id"] for r in v.quarantined.collect()}
    assert good == {1, 2} and quar == {3, 4}
    # the rule mirrors word_shingles' boundary: quarantined docs would
    # have produced ZERO shingles
    n_shingles = word_shingles(docs.filter("doc_id in (3, 4)")).count()
    assert n_shingles == 0
    assert word_shingles(docs.filter("doc_id = 2")).count() > 0


def test_curation_pipeline_composes_text_and_image_stages(spark):
    """Round 9 capstone: the multimodal curation pipeline's IMAGE stage
    must be ACTIVE at fixture scale (drop at least one perceptual-hash
    duplicate beyond the text survivors — a pipeline whose last stage is
    a no-op would green-wash the composition), keep survivors a strict
    subset, and match its DuckDB oracle."""
    from metrics_database_cron_script_spark.functions import dedup as D
    from metrics_database_cron_script_spark.oracle import check_query
    from metrics_database_cron_script_spark.plans import QUERIES
    from metrics_database_cron_script_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    text_surv = {
        r["doc_id"]
        for r in D.dedup_pipeline_portable(
            load_table(spark, sf, "documents")
        ).select("doc_id").collect()
    }
    final = {
        r["doc_id"]
        for r in QUERIES["x_curation_pipeline"](spark, sf)
        .select("doc_id")
        .collect()
    }
    assert final < text_surv  # strict subset: image stage dropped someone
    res = check_query(spark, sf, "x_curation_pipeline")
    assert res["ok"], res


def test_curation_pipeline_av_every_stage_active(spark):
    """Round 10 capstone: the FIVE-modality pipeline's audio and video
    stages must each be ACTIVE at fixture scale (strictly shrink the
    previous stage's survivor set — a no-op tail stage would green-wash
    the composition), and the end-to-end result must match its oracle."""
    from metrics_database_cron_script_spark.oracle import check_query
    from metrics_database_cron_script_spark.plans import QUERIES
    from metrics_database_cron_script_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    img_surv = {
        r["doc_id"]
        for r in QUERIES["x_curation_pipeline"](spark, sf)
        .select("doc_id")
        .collect()
    }
    final = {
        r["doc_id"]
        for r in QUERIES["x_curation_pipeline_av"](spark, sf)
        .select("doc_id")
        .collect()
    }
    assert final < img_surv, "audio/video stages dropped nobody"
    # prove EACH tail stage active: rebuild the audio-stage survivor set
    # from the same operators, then video must still shrink it
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.functions import audio as AU

    img_df = load_table(spark, sf, "documents").filter(
        F.col("doc_id").isin(list(img_surv))
    )
    aud = AU.decode_sample_stats(AU.synthetic_wav_blobs_stemmed(img_df, mod=3))
    w = Window.partitionBy(
        "rate", "n_samples", "n_channels", "s_sum", "s_weighted"
    ).orderBy("doc_id")
    aud_surv = {
        r["doc_id"]
        for r in aud.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id")
        .collect()
    }
    assert aud_surv < img_surv, "audio stage dropped nobody"
    assert final < aud_surv, "video stage dropped nobody"
    res = check_query(spark, sf, "x_curation_pipeline_av")
    assert res["ok"], res
