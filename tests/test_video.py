"""RIFF/AVI codec (round 8 — the video modality): round-trips, container
structure, strict refusal of compressed flavors, and the two oracled
frame queries."""

from __future__ import annotations

import numpy as np
import pytest

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


def test_avi_frames_query_matches_oracle(spark):
    from metrics_database_cron_script_spark.oracle import check_query

    res = check_query(spark, "/root/testdata/sf0.001", "x_avi_frames")
    assert res["ok"], res


def test_video_keyframes_query_matches_oracle(spark):
    from metrics_database_cron_script_spark.oracle import check_query

    res = check_query(spark, "/root/testdata/sf0.001", "x_video_keyframes")
    assert res["ok"], res
