"""RIFF/AVI codec (round 8 — the video modality): round-trips, container
structure, strict refusal of compressed flavors, and the two oracled
frame queries."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMOKE

from metrics_database_cron_script_spark.functions.video import (
    decode_avi,
    encode_avi,
    synth_video_dims,
    synth_video_frames,
)


def _frames(h, w, n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


@pytest.mark.parametrize("h,w,n", [(5, 7, 1), (6, 8, 4), (9, 3, 2), (4, 4, 3)])
def test_roundtrip(h, w, n):
    fr = _frames(h, w, n, seed=h * w + n)
    out = decode_avi(encode_avi(fr))
    assert len(out) == n
    for a, b in zip(out, fr):
        assert np.array_equal(a, b)


def test_synth_frames_match_formula():
    doc_id = 777
    w, h, n = synth_video_dims(doc_id)
    fr = synth_video_frames(doc_id)
    assert len(fr) == n and fr[0].shape == (h, w, 3)
    assert fr[1][2, 3, 1] == (doc_id * 29 + 1 * 59 + 3 * 7 + 2 * 13 + 101) % 256


def test_ragged_frames_rejected_on_encode():
    with pytest.raises(ValueError, match="ragged"):
        encode_avi([np.zeros((4, 4, 3), np.uint8), np.zeros((4, 5, 3), np.uint8)])
    with pytest.raises(ValueError, match="at least one"):
        encode_avi([])


def test_malformed_and_unsupported_rejected():
    blob = encode_avi(synth_video_frames(3))
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_avi(b"XXXX" + blob[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_avi(blob[:60])
    # compressed frame chunk ('00dc') must be diagnosed, not misparsed
    dc = bytearray(blob)
    i = dc.find(b"00db")
    dc[i : i + 4] = b"00dc"
    with pytest.raises(ValueError, match="compressed"):
        decode_avi(bytes(dc))
    # a wrong-size frame body must be caught against the strf dims
    short = bytearray(blob)
    i = short.find(b"00db")
    n = int.from_bytes(short[i + 4 : i + 8], "little")
    short[i + 4 : i + 8] = (n - 4).to_bytes(4, "little")
    with pytest.raises(ValueError):
        decode_avi(bytes(short))


def test_topdown_dib_decodes_unflipped():
    """Negative biHeight = top-down DIB: rows are stored first-row-first,
    so the decoder must NOT apply the bottom-up row flip (round-9 advice:
    a silently vertically-flipped frame is exactly the 'garbage frame'
    the contract forbids). Built by patching the encoder's strf biHeight
    negative and storing the rows unreversed."""
    import struct

    fr = _frames(6, 8, 2, seed=11)
    blob = bytearray(encode_avi(fr))
    i = blob.find(b"strf")
    # strf body: biSize(4) biWidth(4) biHeight(4) — flip biHeight's sign
    (bh,) = struct.unpack("<i", blob[i + 16 : i + 20])
    blob[i + 16 : i + 20] = struct.pack("<i", -bh)
    # rewrite each frame body top-down (undo the encoder's row reversal)
    h, w = fr[0].shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    pos = 0
    for f in fr:
        pos = blob.find(b"00db", pos)
        body = np.zeros((h, row_bytes), dtype=np.uint8)
        body[:, : w * 3] = f[:, :, ::-1].reshape(h, w * 3)
        blob[pos + 8 : pos + 8 + row_bytes * h] = body.tobytes()
        pos += 8
    out = decode_avi(bytes(blob))
    assert len(out) == 2
    for a, b in zip(out, fr):
        assert np.array_equal(a, b)


def test_idx1_entry_size_is_unpadded_body_length():
    """idx1 entries must record the UNPADDED frame body size (round-9
    advice: deriving it from the padded chunk length would mis-size
    odd-length bodies). Walk idx1 and compare each recorded size against
    the '00db' chunk's own length field."""
    blob = encode_avi(_frames(5, 7, 3, seed=4))
    i = blob.find(b"idx1")
    n_entries = int.from_bytes(blob[i + 4 : i + 8], "little") // 16
    sizes = [
        int.from_bytes(blob[i + 8 + 16 * e + 12 : i + 8 + 16 * e + 16], "little")
        for e in range(n_entries)
    ]
    body_lens, pos = [], 0
    while (pos := blob.find(b"00db", pos)) != -1:
        body_lens.append(int.from_bytes(blob[pos + 4 : pos + 8], "little"))
        pos += 8
    # idx1's own '00db' tags appear in the entry stream too — the movi
    # scan above stops at the idx1 chunk start
    body_lens = body_lens[: len(sizes)]
    assert n_entries == 3 and sizes == body_lens


def test_avi_frames_query_matches_oracle(spark):
    from metrics_database_cron_script_spark.oracle import check_query

    res = check_query(spark, "/root/testdata/sf0.001", "x_avi_frames")
    assert res["ok"], res


def test_video_keyframes_query_matches_oracle(spark):
    from metrics_database_cron_script_spark.oracle import check_query

    res = check_query(spark, "/root/testdata/sf0.001", "x_video_keyframes")
    assert res["ok"], res


def test_video_exact_dedup_is_frame_order_sensitive(spark):
    """Round 9: the video fingerprint must separate the SAME frames in a
    different order (the px_ordered frame-position factor) while grouping
    byte-identical stem replicas together."""
    import numpy as np
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.functions.video import (
        encode_avi,
        synthetic_avi_blobs_stemmed,
        video_exact_dedup,
    )
    from metrics_database_cron_script_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 16)
    groups = video_exact_dedup(synthetic_avi_blobs_stemmed(docs, mod=4)).collect()
    assert len(groups) == 4
    assert all(r["n_docs"] == 4 and r["rep_doc"] % 4 == 0 for r in groups)

    # same two frames, swapped order -> distinct fingerprints
    rng = np.random.default_rng(3)
    a, b = (rng.integers(0, 256, (6, 8, 3), dtype=np.uint8) for _ in range(2))
    blobs = spark.createDataFrame(
        [(1, encode_avi([a, b])), (2, encode_avi([b, a]))],
        "doc_id long, payload binary",
    )
    assert video_exact_dedup(blobs).count() == 2


def test_video_dedup_query_matches_oracle(spark):
    from metrics_database_cron_script_spark.oracle import check_query

    res = check_query(spark, "/root/testdata/sf0.001", "x_video_dedup")
    assert res["ok"], res


def test_frame_neardup_finds_all_planted_pairs_no_cross_stem(spark):
    """Round 9: frame-set Jaccard must find EVERY within-stem pair (each
    stem's 4 variants share all-but-one frame) and no cross-stem pair
    (different stems share zero frames); video_exact_dedup must NOT group
    the retouched variants (the near-dup operator earns its keep)."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.functions.video import (
        synthetic_avi_blobs_perturbed,
        video_exact_dedup,
        video_frame_neardup_pairs,
    )
    from metrics_database_cron_script_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 24)
    blobs = synthetic_avi_blobs_perturbed(docs, mod=4)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in video_frame_neardup_pairs(blobs, threshold=0.25).collect()
    }
    want = {
        pair
        for stem in range(0, 24, 4)
        for pair in combinations(range(stem, stem + 4), 2)
    }
    assert got == want  # all 36 planted pairs, nothing else
    # exact dedup cannot group them: each variant's retouched frame makes
    # every one of the 24 videos a distinct content fingerprint
    assert video_exact_dedup(blobs).count() == 24


def test_neardup_threshold_filters_on_unrounded_jaccard(spark):
    """Round 10 (ADVICE): the threshold must compare the UNROUNDED ratio —
    the same boundary the SQL oracle uses. A pair with true jaccard 2/3
    (0.66666…) rounds to 0.666667; at threshold 0.6666668 the rounded value
    passes but the true ratio fails, so the pair must be DROPPED. At a
    threshold below the true ratio it is kept with the rounded projection."""
    from metrics_database_cron_script_spark.functions.video import (
        video_frame_neardup_pairs,
    )

    f = _frames(4, 4, 3, seed=11)  # three distinct frames
    blobs = spark.createDataFrame(
        [(1, encode_avi(f[:2])), (2, encode_avi(f))],  # shared=2, union=3
        "doc_id long, payload binary",
    )
    assert video_frame_neardup_pairs(blobs, threshold=0.6666668).count() == 0
    kept = video_frame_neardup_pairs(blobs, threshold=0.6).collect()
    assert len(kept) == 1 and kept[0]["jaccard"] == 0.666667
