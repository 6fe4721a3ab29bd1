"""Property-fuzz of every native container walk (round-9 verdict item 7):
the decoders promise "ValueError, never garbage" — hypothesis hammers that
promise with truncations, single-byte corruptions, length-field flips and
magic-prefixed noise. The contract under test: decode either SUCCEEDS
(returning a well-formed result) or raises ValueError / the documented
NotImplementedError — never IndexError, struct.error, KeyError,
AssertionError, OverflowError or a numpy reshape explosion.

No Spark session needed — the codecs are plain functions; keeping these
tests JVM-free makes the fuzz cheap enough for wide example counts.

Randomized campaigns (fresh seeds, run by hand per the round-9 protocol;
the suite itself stays derandomized): round 9 found 2 real bugs; round 10
ran 3,000 rounds × 5 containers × 2 checks (~30k decodes: truncation,
1-8-byte corruption, window splices, appended noise, cross-format body
swaps, every payload also through the decode_image dispatcher) — zero
contract escapes — plus a CHUNK-LEVEL campaign (4,000 rounds × 4
containers: PNG chunk shuffle/duplicate/drop/length-flip, RIFF window
duplicate/drop + size-field flips, JPEG marker-segment shuffles) — also
zero escapes.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# Deterministic example generation (derandomize=True on every test, NOT a
# global profile — that would leak into the other property-test modules):
# the fuzz ran WIDE during development (it caught the DC-category int64
# overflow and the dangling-0xff TypeError); in the suite it must be
# replayable — a fresh random seed finding a new example mid-CI is a
# flake, not a gate.

from metrics_database_cron_script_spark.functions.audio import (
    decode_wav,
    encode_wav,
)
from metrics_database_cron_script_spark.functions.multimodal import (
    decode_bmp,
    decode_image,
    decode_jpeg,
    decode_png,
    encode_bmp,
    encode_jpeg,
    encode_png,
)
from metrics_database_cron_script_spark.functions.video import (
    decode_avi,
    encode_avi,
)

# the only exceptions a structural decode failure may surface as; PIL is
# absent in this image, so decode_image's fallback raises the documented
# NotImplementedError for unknown formats
ALLOWED = (ValueError, NotImplementedError, zlib.error)


def _img(seed: int, h: int = 9, w: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _valid_blobs() -> dict[str, bytes]:
    rng = np.random.default_rng(7)
    samples = rng.integers(-(2**14), 2**14, 300, dtype=np.int16)
    return {
        "bmp": encode_bmp(_img(1)),
        "png": encode_png(_img(2)),
        "jpeg": encode_jpeg(_img(3), quality=90),
        "wav": encode_wav(samples, rate=8000),
        "avi": encode_avi([_img(4, 6, 8), _img(5, 6, 8)]),
    }


BLOBS = _valid_blobs()
DECODERS = {
    "bmp": decode_bmp,
    "png": decode_png,
    "jpeg": decode_jpeg,
    "wav": decode_wav,
    "avi": decode_avi,
}


def _clean_or_allowed(kind: str, payload: bytes) -> None:
    """Decode must succeed or raise an ALLOWED exception."""
    try:
        out = DECODERS[kind](payload)
    except ALLOWED:
        return
    # success path: result must be well-formed, not garbage shells
    if kind == "wav":
        rate, arr = out
        assert rate > 0 and arr.dtype == np.int16
    elif kind == "avi":
        assert all(f.dtype == np.uint8 and f.ndim == 3 for f in out)
    else:
        assert out.dtype == np.uint8 and out.ndim == 3


@pytest.mark.parametrize("kind", sorted(BLOBS))
@given(cut=st.integers(min_value=0, max_value=4096))
@settings(max_examples=60, deadline=None, derandomize=True)
def test_truncation_never_escapes_valueerror(kind, cut):
    blob = BLOBS[kind]
    _clean_or_allowed(kind, blob[: min(cut, len(blob))])


@pytest.mark.parametrize("kind", sorted(BLOBS))
@given(pos=st.integers(min_value=0, max_value=4095), val=st.integers(0, 255))
@settings(max_examples=120, deadline=None, derandomize=True)
def test_single_byte_corruption_never_escapes_valueerror(kind, pos, val):
    blob = bytearray(BLOBS[kind])
    blob[pos % len(blob)] = val
    _clean_or_allowed(kind, bytes(blob))


@pytest.mark.parametrize("kind", sorted(BLOBS))
@given(
    pos=st.integers(min_value=4, max_value=4092),
    length=st.integers(min_value=0, max_value=0xFFFFFFFF),
)
@settings(max_examples=60, deadline=None, derandomize=True)
def test_length_field_flip_never_escapes_valueerror(kind, pos, length):
    """Overwrite 4 bytes ANYWHERE with an arbitrary little-endian length —
    the classic chunk-length attack on RIFF/PNG walks."""
    blob = bytearray(BLOBS[kind])
    p = pos % max(1, len(blob) - 4)
    blob[p : p + 4] = length.to_bytes(4, "little")
    _clean_or_allowed(kind, bytes(blob))


@pytest.mark.parametrize("kind", sorted(BLOBS))
@given(noise=st.binary(min_size=0, max_size=512))
@settings(max_examples=60, deadline=None, derandomize=True)
def test_magic_prefixed_noise_never_escapes_valueerror(kind, noise):
    """Valid magic + random tail: the walk must diagnose, not wander."""
    magic = {
        "bmp": b"BM",
        "png": b"\x89PNG\r\n\x1a\n",
        "jpeg": b"\xff\xd8",
        "wav": b"RIFF\x24\x00\x00\x00WAVE",
        "avi": b"RIFF\x24\x00\x00\x00AVI ",
    }[kind]
    _clean_or_allowed(kind, magic + noise)


@given(noise=st.binary(min_size=0, max_size=256))
@settings(max_examples=60, deadline=None, derandomize=True)
def test_decode_image_dispatch_never_escapes(noise):
    """The dispatcher itself: any byte string decodes, raises ValueError
    (native diagnosis) or NotImplementedError (no PIL for the format)."""
    try:
        out = decode_image(noise)
        assert out.dtype == np.uint8 and out.ndim == 3
    except ALLOWED:
        pass
