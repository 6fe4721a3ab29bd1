"""BMP codec: real dependency-free pixel decode (round-5 verdict item 6).
Round-trips, layout variants (padding, top-down, offset gap), malformed
rejection, and the oracled decode query."""

from __future__ import annotations

import numpy as np
import pytest

from metrics_database_cron_script_spark.functions.multimodal import (
    decode_bmp,
    decode_image,
    encode_bmp,
    synth_dims,
    synth_pixels,
)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 16])  # every padding phase
def test_roundtrip_all_padding_phases(w):
    img = _img(7, w, seed=w)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_decode_image_dispatches_bmp_without_pil():
    img = _img(5, 9, seed=3)
    assert np.array_equal(decode_image(encode_bmp(img)), img)


def test_decode_image_non_bmp_raises_without_pil():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed: fallback path is live")
    except ImportError:
        pass
    # GIF magic: BMP/PNG/baseline-JPEG all decode natively now, so only
    # formats outside that set exercise the PIL gate
    with pytest.raises(NotImplementedError, match="requires PIL"):
        decode_image(b"GIF87a" + b"\x00" * 64)


def test_top_down_layout():
    """Negative height = top-down rows: decoder must NOT flip them."""
    img = _img(4, 6, seed=1)
    buf = bytearray(encode_bmp(img[::-1]))  # encoded bottom-up of flipped
    buf[22:26] = (-4).to_bytes(4, "little", signed=True)
    assert np.array_equal(decode_bmp(bytes(buf)), img)


def test_pixel_offset_gap():
    """Pixel data offset beyond the 54-byte headers (e.g. a palette gap)
    must be honored, not assumed."""
    img = _img(3, 5, seed=2)
    raw = encode_bmp(img)
    gap = b"\xee" * 12
    buf = bytearray(raw[:54] + gap + raw[54:])
    buf[10:14] = (54 + 12).to_bytes(4, "little")
    assert np.array_equal(decode_bmp(bytes(buf)), img)


def test_malformed_rejected():
    img = _img(4, 4)
    raw = encode_bmp(img)
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + raw[2:])
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(raw[:-8])
    eight = bytearray(raw)
    eight[28:30] = (8).to_bytes(2, "little")
    with pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(eight))
    rle = bytearray(raw)
    rle[30:34] = (1).to_bytes(4, "little")
    with pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(rle))


def test_synth_pixels_match_formula():
    doc_id = 1234
    w, h = synth_dims(doc_id)
    img = synth_pixels(doc_id)
    assert img.shape == (h, w, 3)
    assert img[2, 3, 1] == (doc_id * 31 + 3 * 7 + 2 * 13 + 101) % 256


def test_decode_query_matches_oracle(spark):
    from metrics_database_cron_script_spark.oracle import check_query

    res = check_query(spark, "/root/testdata/sf0.001", "x_multimodal_decode")
    assert res["ok"], res


# ------------------------------------------------------------- PNG codec


def test_png_roundtrip_all_filters():
    """encode_png cycles the row filter through all five types (row % 5),
    so a 10-row image exercises None/Sub/Up/Average/Paeth twice each; the
    decode must reconstruct exactly."""
    import numpy as np

    from metrics_database_cron_script_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(42)
    for shape in [(1, 1), (5, 8), (10, 3), (11, 16), (64, 40)]:
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        assert (decode_png(encode_png(img)) == img).all(), shape


def test_png_rejects_corrupt_and_unsupported():
    import struct
    import zlib

    import numpy as np
    import pytest

    from metrics_database_cron_script_spark.functions.multimodal import (
        _PNG_MAGIC,
        decode_png,
        encode_png,
        synth_pixels,
    )

    raw = bytearray(encode_png(synth_pixels(7)))
    # flip one IDAT byte -> CRC check must catch it
    raw[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|IHDR"):
        decode_png(bytes(raw))
    # 16-bit depth is unsupported -> explicit refusal, not garbage
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(_PNG_MAGIC + chunk)
    assert isinstance(synth_pixels(0), np.ndarray)


def test_decode_image_dispatches_png():
    from metrics_database_cron_script_spark.functions.multimodal import (
        decode_image,
        encode_png,
        synth_pixels,
    )

    img = synth_pixels(99)
    assert (decode_image(encode_png(img)) == img).all()


def test_png_decode_query_matches_oracle(spark):
    from metrics_database_cron_script_spark.oracle import check_query

    res = check_query(spark, "/root/testdata/sf0.001", "x_png_decode")
    assert res["ok"], res


def test_png_truncated_raises_valueerror_not_struct_error():
    """Review fix: a payload cut off mid-chunk must surface as the
    documented ValueError (quarantine-able), never struct.error."""
    import pytest

    from metrics_database_cron_script_spark.functions.multimodal import (
        decode_png,
        encode_png,
        synth_pixels,
    )

    raw = encode_png(synth_pixels(5))
    for cut in (len(raw) // 2, len(raw) - 3, 20):
        with pytest.raises(ValueError):
            decode_png(raw[:cut])


# ------------------------------------------------------------ JPEG codec
# Native baseline JPEG (round-7 verdict item 6): the one DCT/entropy-coded
# format, dependency-free. Bit-exact on the block-constant gray fixture
# class (one integer DC per block at quality 100), tolerance-bounded on
# arbitrary images, strict ValueError on every unsupported flavor.


def test_jpeg_exact_roundtrip_on_fixture_class():
    from metrics_database_cron_script_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
        synth_jpeg_pixels,
    )

    for doc_id in [0, 1, 2, 3, 5, 7, 11, 100, 999]:
        px = synth_jpeg_pixels(doc_id)
        out = decode_jpeg(encode_jpeg(px, quality=100))
        assert np.array_equal(out, px), doc_id


def test_jpeg_color_roundtrip_tolerance_q100():
    """Arbitrary RGB at quality 100 (all-ones quant): the only loss is
    DCT-coefficient rounding, bounded by a few gray levels even on
    uniform noise (JPEG's worst case)."""
    from metrics_database_cron_script_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    for h, w, seed in [(8, 8, 0), (24, 16, 1), (13, 21, 2), (5, 3, 3)]:
        img = _img(h, w, seed=seed)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int)).max()
        assert err <= 3, (h, w, err)


def test_jpeg_grayscale_single_component():
    from metrics_database_cron_script_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, size=(17, 9), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=100))
    want = np.stack([g, g, g], axis=-1)
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 3


def test_jpeg_lossy_quality_monotone():
    """Smooth-gradient content: lower quality → more error, and q=90 stays
    within a couple of gray levels (the standard codec behavior the
    tables/zigzag/EXTEND chain must reproduce)."""
    from metrics_database_cron_script_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    x, y = np.arange(64), np.arange(48)
    img = (
        (x[None, :, None] * 2 + y[:, None, None] * 3
         + np.array([0, 40, 80])[None, None, :]) % 256
    ).astype(np.uint8)
    errs = []
    for q in (90, 50, 10):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
    assert errs[0] < 3.0, errs
    assert errs[0] < errs[1] < errs[2], errs


def test_jpeg_byte_stuffing_roundtrip():
    """An image engineered to emit 0xFF bytes in the entropy stream must
    round-trip through the stuff/unstuff path; rather than constructing
    one analytically, sweep seeds until the encoded scan contains a
    stuffed 0xFF 0x00 sequence (deterministic: fixed seed list)."""
    from metrics_database_cron_script_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    hit = False
    for seed in range(20):
        img = _img(16, 16, seed=seed)
        blob = encode_jpeg(img, quality=100)
        scan = blob[blob.find(b"\xff\xda") :]
        if b"\xff\x00" in scan:
            hit = True
            out = decode_jpeg(blob)
            assert np.abs(out.astype(int) - img.astype(int)).max() <= 3
    assert hit, "no seed produced a stuffed byte — widen the sweep"


def test_jpeg_rejects_unsupported_and_corrupt():
    from metrics_database_cron_script_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    blob = encode_jpeg(_img(8, 8, seed=4), quality=90)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"BM" + blob)
    with pytest.raises(ValueError):
        decode_jpeg(blob[:40])  # truncated mid-segment
    with pytest.raises(ValueError, match="missing SOF0/SOS"):
        decode_jpeg(b"\xff\xd8\xff\xd9")
    # progressive SOF2 marker must be diagnosed, not garbage-decoded
    sof0 = blob.find(b"\xff\xc0")
    progressive = blob[:sof0] + b"\xff\xc2" + blob[sof0 + 2 :]
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(progressive)
    # truncated entropy stream (cut before EOI)
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) - 10])


def test_jpeg_malformed_dht_and_short_segment_raise_valueerror():
    """Round-9 advice: a malformed DHT used to trip an `assert` (gone
    under python -O) and short segments leaked IndexError/struct.error —
    all structural corruption must surface as ValueError so
    decode_image's except-ValueError dispatch catches it."""
    from metrics_database_cron_script_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    blob = encode_jpeg(_img(8, 8, seed=9), quality=90)
    # corrupt the DHT's BITS counts so they disagree with the value count
    dht = blob.find(b"\xff\xc4")
    assert dht != -1
    bad = bytearray(blob)
    bad[dht + 5] = 200  # BITS[0]: claims 200 one-bit codes, few vals follow
    with pytest.raises(ValueError, match="malformed DHT"):
        decode_jpeg(bytes(bad))
    # a segment whose declared length runs past the payload end must be a
    # clean ValueError, never a bare IndexError/struct.error
    for cut in (4, 6, 21, 40):
        with pytest.raises(ValueError):
            decode_jpeg(blob[:cut])


def test_decode_image_dispatches_jpeg():
    from metrics_database_cron_script_spark.functions.multimodal import (
        decode_image,
        encode_jpeg,
        synth_jpeg_pixels,
    )

    px = synth_jpeg_pixels(42)
    assert np.array_equal(decode_image(encode_jpeg(px, quality=100)), px)


def test_jpeg_decode_query_matches_oracle(spark):
    from metrics_database_cron_script_spark.oracle import check_query

    res = check_query(spark, "/root/testdata/sf0.001", "x_jpeg_decode")
    assert res["ok"], res


def test_ahash_dead_letter_routes_corrupt_payloads(spark):
    """Round-9 verdict item 7: the binary dead-letter path — corrupt
    payloads become (phash NULL, error <diagnosis>) rows instead of
    killing the Arrow batch; clean BMP/PNG/JPEG all hash; and the frame
    composes with quarantine_degenerate_hashes (NULL phash routes to
    quarantine under the null-rejecting rule)."""
    import numpy as np

    from metrics_database_cron_script_spark.functions.multimodal import (
        ahash_with_dead_letter,
        encode_bmp,
        encode_jpeg,
        encode_png,
        quarantine_degenerate_hashes,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    rows = [
        (1, encode_bmp(img)),
        (2, encode_png(img)),
        (3, encode_jpeg(img, quality=100)),
        (4, encode_bmp(img)[:20]),       # truncated → ValueError
        (5, b"GIF89a" + b"\x00" * 64),   # no PIL → NotImplementedError
    ]
    blobs = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in ahash_with_dead_letter(blobs).collect()}
    assert all(got[i]["error"] is None and got[i]["phash"] for i in (1, 2, 3))
    assert got[4]["phash"] is None and "ValueError" in got[4]["error"]
    assert got[5]["phash"] is None and "NotImplementedError" in got[5]["error"]
    # BMP is lossless and JPEG q=100 on this fixture class decodes close;
    # BMP and PNG hashes of the SAME image must agree exactly
    assert got[1]["phash"] == got[2]["phash"]

    v = quarantine_degenerate_hashes(
        ahash_with_dead_letter(blobs).drop("error")
    )
    assert {r["doc_id"] for r in v.quarantined.collect()} == {4, 5}
