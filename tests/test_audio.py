"""WAV/PCM codec (round 8 — the third modality): round-trips, layout
variants, strict refusal of non-PCM-16 flavors, and the two oracled audio
queries (sample digests + frame energy)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMOKE

from metrics_database_cron_script_spark.functions.audio import (
    decode_wav,
    encode_wav,
    synth_wav_dims,
    synth_wav_samples,
)


def _pcm(n, ch, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)


@pytest.mark.parametrize("ch", [1, 2, 4])
def test_roundtrip_channels(ch):
    s = _pcm(333, ch, seed=ch)
    rate, out = decode_wav(encode_wav(s, 22_050))
    assert rate == 22_050 and np.array_equal(out, s)


def test_mono_1d_input():
    m = np.arange(-100, 100, dtype=np.int16)
    rate, out = decode_wav(encode_wav(m))
    assert out.shape == (200, 1) and np.array_equal(out[:, 0], m)


def test_extreme_sample_values_roundtrip():
    s = np.array([[-32768, 32767], [0, -1], [1, 32767]], dtype=np.int16)
    _, out = decode_wav(encode_wav(s))
    assert np.array_equal(out, s)


def test_unknown_chunks_skipped_word_aligned():
    """A LIST/odd-length chunk before data must be skipped with word
    alignment honored (the classic WAV-parser bug)."""
    import struct

    s = _pcm(10, 1, seed=3)
    raw = encode_wav(s)
    # splice an odd-length junk chunk between fmt and data
    fmt_end = raw.index(b"data")
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    patched = bytearray(raw[:fmt_end] + junk + raw[fmt_end:])
    patched[4:8] = (len(patched) - 8).to_bytes(4, "little")
    _, out = decode_wav(bytes(patched))
    assert np.array_equal(out, s)


def test_malformed_and_unsupported_rejected():
    s = _pcm(8, 2, seed=4)
    raw = encode_wav(s)
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"XXXX" + raw[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(raw[:-5])
    flt = bytearray(raw)
    flt[20] = 3  # IEEE float codec
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(bytes(flt))
    b8 = bytearray(raw)
    b8[34] = 8  # 8-bit
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(bytes(b8))
    ragged = bytearray(raw)
    # shrink data length by 1 byte -> not a whole number of frames
    data_at = raw.index(b"data")
    n = int.from_bytes(raw[data_at + 4 : data_at + 8], "little")
    ragged[data_at + 4 : data_at + 8] = (n - 1).to_bytes(4, "little")
    with pytest.raises(ValueError, match="whole number of frames|truncated"):
        decode_wav(bytes(ragged[:-1]))


def test_synth_samples_match_formula():
    doc_id = 4242
    n, ch = synth_wav_dims(doc_id)
    s = synth_wav_samples(doc_id)
    assert s.shape == (n, ch)
    assert s[5, ch - 1] == ((doc_id * 37 + 5 * 13 + (ch - 1) * 101) % 4001) - 2000


def test_frame_energy_boundaries(spark):
    """n < frame → zero frames; exact full-window count otherwise."""
    from metrics_database_cron_script_spark.functions.audio import (
        frame_energy,
    )

    blobs = spark.createDataFrame(
        [
            (1, encode_wav(_pcm(100, 1, seed=1))),   # < 128 -> no frames
            (2, encode_wav(_pcm(128, 1, seed=2))),   # exactly one
            (3, encode_wav(_pcm(300, 2, seed=3))),   # floor((300-128)/64)+1 = 3
        ],
        "doc_id long, payload binary",
    )
    got = frame_energy(blobs, frame=128, hop=64).collect()
    per_doc = {}
    for r in got:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert 1 not in per_doc
    assert sorted(per_doc[2]) == [0]
    assert sorted(per_doc[3]) == [0, 1, 2]


def test_wav_decode_query_matches_oracle(spark):
    from metrics_database_cron_script_spark.oracle import check_query

    res = check_query(spark, "/root/testdata/sf0.001", "x_wav_decode")
    assert res["ok"], res


def test_frame_energy_query_matches_oracle(spark):
    from metrics_database_cron_script_spark.oracle import check_query

    res = check_query(spark, "/root/testdata/sf0.001", "x_audio_frame_energy")
    assert res["ok"], res


def test_wav_exact_dedup_groups_stems(spark):
    """Round 9: the audio dedup fingerprint groups exactly the planted
    stem classes (every 3 consecutive docs share byte-identical audio),
    with rep_doc = the stem head, and separates a one-sample change."""
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.functions.audio import (
        synthetic_wav_blobs_stemmed,
        wav_exact_dedup,
    )
    from metrics_database_cron_script_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 30)
    groups = wav_exact_dedup(synthetic_wav_blobs_stemmed(docs, mod=3)).collect()
    assert len(groups) == 10
    assert all(r["n_docs"] == 3 and r["rep_doc"] % 3 == 0 for r in groups)


def test_wav_dedup_query_matches_oracle(spark):
    from metrics_database_cron_script_spark.oracle import check_query

    res = check_query(spark, "/root/testdata/sf0.001", "x_wav_dedup")
    assert res["ok"], res


def test_fingerprint_dedup_groups_volume_scaled_copies_exact_cannot(spark):
    """Round 9: the delta-sign energy fingerprint must group the SAME
    recording at different volumes (x1/x2/x3 sample scaling — integer
    energies scale by exactly k², every comparison preserved), which the
    exact sample-digest dedup provably cannot; and it must still separate
    different stems."""
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.functions.audio import (
        audio_fingerprint_dedup,
        synthetic_wav_blobs_scaled,
        wav_exact_dedup,
    )
    from metrics_database_cron_script_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 30)
    blobs = synthetic_wav_blobs_scaled(docs, mod=3)
    fp_groups = audio_fingerprint_dedup(blobs).collect()
    assert len(fp_groups) == 10  # one group per stem
    assert all(r["n_docs"] == 3 and r["rep_doc"] % 3 == 0 for r in fp_groups)
    # exact dedup sees 30 distinct sample digests — zero grouping
    assert wav_exact_dedup(blobs).count() == 30


def test_delta_fingerprint_drops_docs_with_fewer_than_two_frames(spark):
    """Round 10 (ADVICE): a delta fingerprint needs a predecessor frame, so
    docs with 0 or 1 energy frames must emit NO row — matching the SQL
    oracle's `prev IS NOT NULL` boundary. Without the size guard, Spark's
    sequence(1, 0) auto-steps DOWN to [1, 0] and fabricates a spurious '00'
    fingerprint for the single-frame doc."""
    from metrics_database_cron_script_spark.functions.audio import (
        audio_delta_fingerprint,
    )

    blobs = spark.createDataFrame(
        [
            (1, encode_wav(_pcm(100, 1, seed=1))),  # 0 frames (< frame size)
            (2, encode_wav(_pcm(128, 1, seed=2))),  # exactly 1 frame
            (3, encode_wav(_pcm(300, 1, seed=3))),  # 3 frames -> 2 deltas
        ],
        "doc_id long, payload binary",
    )
    rows = {
        r["doc_id"]: r["fingerprint"]
        for r in audio_delta_fingerprint(blobs, frame=128, hop=64).collect()
    }
    assert set(rows) == {3}
    assert len(rows[3]) == 2 and set(rows[3]) <= {"0", "1"}
