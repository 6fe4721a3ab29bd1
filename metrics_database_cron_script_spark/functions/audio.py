"""Audio columns: native WAV/PCM codec + Arrow-batched feature extraction.

The third modality of the multimodal family (images: multimodal.py BMP/
PNG/JPEG; video: frame_sample's byte shape). Audio at 100 TB follows the
same pattern — the payload is an opaque BinaryType column, decode runs as
Arrow-batched mapInPandas, and downstream features (frame energy, stats)
are tiny typed rows that shuffle cheaply. WAV/PCM-16 is fully specified
by the RIFF container (fmt + data chunks), so the codec below is
dependency-free (stdlib struct + numpy), the same standard every audio
tool writes.

Exactness contract for the oracles: PCM samples are INTEGERS, and every
feature below is integer arithmetic (sums, sums of squares, position
weights) — so a SQL oracle can recompute the decoded-sample digests from
the generating formula with zero float ambiguity, the way x_multimodal_
decode does for pixels."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (query modules compose)

_RIFF = b"RIFF"
_WAVE = b"WAVE"


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """Encode int16 PCM samples — (n,) mono or (n, ch) interleaved — as a
    canonical RIFF/WAVE file (fmt chunk: PCM, 16-bit, little-endian)."""
    import struct

    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError(f"expected (n,) or (n, ch) samples, got {samples.shape}")
    if samples.dtype != np.int16:
        raise ValueError(f"expected int16 PCM, got {samples.dtype}")
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()  # interleaved little-endian
    fmt = struct.pack(
        "<HHIIHH",
        1,              # PCM
        ch,
        rate,
        rate * ch * 2,  # byte rate
        ch * 2,         # block align
        16,             # bits per sample
    )
    body = (
        _WAVE
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return _RIFF + len(body).to_bytes(4, "little") + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a RIFF/WAVE PCM-16 payload to (rate, (n, ch) int16 array):
    chunk walk (fmt before data, unknown chunks skipped, word-aligned),
    strict refusal of anything that is not 16-bit integer PCM
    (compressed codecs, float WAV, 8/24-bit) or structurally corrupt —
    ValueError, never garbage samples."""
    import struct

    if payload[:4] != _RIFF or payload[8:12] != _WAVE:
        raise ValueError("not a RIFF/WAVE payload")
    if len(payload) < 12:
        raise ValueError("truncated WAV header")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated WAV chunk {tag!r}")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
            if fmt is not None:
                break  # canonical layout: fmt seen, data closes the walk
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    codec, ch, rate, _brate, _align, bits = fmt
    if codec != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV: codec={codec} bits={bits} (16-bit integer "
            "PCM only — compressed/float WAV is out of native scope)"
        )
    if ch < 1:
        raise ValueError("zero channels")
    if len(data) % (2 * ch):
        raise ValueError("data chunk not a whole number of frames")
    arr = np.frombuffer(data, dtype="<i2").reshape(-1, ch)
    return rate, arr.astype(np.int16)


# ------------------------------------------------ synthetic audio + stats
# The fixtures carry no real audio; the decode path gets deterministic
# synthetic WAVs whose every sample is a pure function of doc_id — the
# same oracle pattern as the synthetic BMP/PNG/JPEG pixels.

SAMPLE_RATE = 16_000


def synth_wav_dims(doc_id: int) -> tuple[int, int]:
    """(n_samples, n_channels): 400-700 samples, mono or stereo."""
    return 400 + (doc_id % 7) * 50, 1 + doc_id % 2


def synth_wav_samples(doc_id: int) -> np.ndarray:
    """(n, ch) int16: sample(i, c) = ((doc_id·37 + i·13 + c·101) mod 4001)
    − 2000 — mirrored literally by the SQL oracles."""
    n, ch = synth_wav_dims(doc_id)
    i = np.arange(n, dtype=np.int64)[:, None]
    c = np.arange(ch, dtype=np.int64)[None, :]
    return (((doc_id * 37 + i * 13 + c * 101) % 4001) - 2000).astype(np.int16)


def _synth_wavs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids = pdf["doc_id"].tolist()
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "payload": [
                    encode_wav(synth_wav_samples(int(d)), SAMPLE_RATE)
                    for d in ids
                ],
            }
        )


def synthetic_wav_blobs(docs: DataFrame) -> DataFrame:
    """doc_id → real RIFF/WAVE PCM-16 bytes, one per document."""
    return docs.select("doc_id").mapInPandas(
        _synth_wavs, schema="doc_id long, payload binary"
    )


def _synth_wavs_stemmed(mod: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        encode_wav(
                            synth_wav_samples(int(d) - int(d) % mod),
                            SAMPLE_RATE,
                        )
                        for d in ids
                    ],
                }
            )

    return gen


def synthetic_wav_blobs_stemmed(docs: DataFrame, mod: int = 3) -> DataFrame:
    """doc_id → WAV bytes synthesized from the doc's STEM (doc_id −
    doc_id % mod): every `mod` consecutive docs carry byte-identical
    audio — the deterministic duplicate plant the dedup queries decode
    and re-discover (the audio analogue of the image replica corpus)."""
    return docs.select("doc_id").mapInPandas(
        _synth_wavs_stemmed(mod), schema="doc_id long, payload binary"
    )


def _synth_wavs_scaled(mod: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            out = []
            for d in ids:
                d = int(d)
                scale = 1 + d % mod
                samples = synth_wav_samples(d - d % mod) * scale
                out.append(encode_wav(samples.astype(np.int16), SAMPLE_RATE))
            yield pd.DataFrame({"doc_id": ids, "payload": out})

    return gen


def synthetic_wav_blobs_scaled(docs: DataFrame, mod: int = 3) -> DataFrame:
    """doc_id → WAV bytes of the doc's STEM audio VOLUME-SCALED by
    (1 + doc_id % mod): every `mod` consecutive docs carry the same
    recording at different amplitudes — byte-DIFFERENT, sample-digest-
    DIFFERENT duplicates that only a loudness-invariant fingerprint can
    group (the plant for x_audio_fingerprint_dedup). Fixture samples are
    ±2000, so ×mod stays far inside int16."""
    return docs.select("doc_id").mapInPandas(
        _synth_wavs_scaled(mod), schema="doc_id long, payload binary"
    )


def audio_delta_fingerprint(
    blobs: DataFrame, frame: int = 64, hop: int = 32
) -> DataFrame:
    """(doc_id, fingerprint): the SIGN-OF-DELTA energy fingerprint — bit
    i = '1' iff frame i's energy exceeds frame i−1's — the core move of
    the classic audio-fingerprint family (Haitsma-Kalper/Chromaprint
    shape): volume scaling multiplies every sample by k, every frame
    energy by exactly k² (integer math end to end), and a positive
    scaling preserves every comparison INCLUDING ties — so the
    fingerprint is amplitude-INVARIANT while any re-timing or content
    change flips bits. One decode pass, one groupBy(doc) with a sorted
    frame-struct array folded to a bitstring; the shuffle carries one
    short string per file.

    Docs with fewer than 2 frames are DROPPED (a delta fingerprint needs
    a predecessor — the SQL oracle's `prev IS NOT NULL` boundary emits no
    row for them). Without the size guard, Spark's sequence(1, 0) would
    auto-step DOWN to [1, 0] and fabricate a spurious '00' fingerprint
    (or raise under ANSI mode)."""
    from pyspark.sql import functions as F

    fe = frame_energy(blobs, frame=frame, hop=hop)
    frames = (
        fe.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("frame_idx"), F.col("energy")))
            ).alias("frames")
        )
        .filter(F.size("frames") > 1)
    )
    arr = F.col("frames")
    bits = F.transform(
        F.sequence(F.lit(1), F.size(arr) - 1),
        lambda i: F.when(
            F.element_at(arr, i + 1)["energy"] > F.element_at(arr, i)["energy"],
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return frames.select(
        "doc_id", F.array_join(bits, "").alias("fingerprint")
    )


def audio_fingerprint_dedup(
    blobs: DataFrame, frame: int = 64, hop: int = 32
) -> DataFrame:
    """Loudness-invariant AUDIO dedup: group by the delta-sign energy
    fingerprint (audio_delta_fingerprint). Catches volume-scaled copies
    that exact dedup (wav_exact_dedup's sample digests) provably cannot —
    the distinction the tests pin."""
    from pyspark.sql import functions as F

    fp = audio_delta_fingerprint(blobs, frame=frame, hop=hop)
    return fp.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("rep_doc"),
    )


def wav_exact_dedup(blobs: DataFrame) -> DataFrame:
    """Exact AUDIO dedup over DECODED content (round 9 — the audio twin
    of multimodal's x_phash_dedup grouping): the fingerprint is the full
    integer digest tuple from decode_sample_stats (rate, shape, sample
    sum, interleave-sensitive weighted sum) — computed from the DECODED
    samples, so re-encoded/container-shuffled duplicates still collide
    while any single-sample change separates. One decode pass, one
    groupBy on a 5-integer key; at 100 TB the shuffle carries ~40 bytes
    per audio file, never payload bytes."""
    from pyspark.sql import functions as F

    stats = decode_sample_stats(blobs)
    return stats.groupBy(
        "rate", "n_samples", "n_channels", "s_sum", "s_weighted"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("rep_doc"),
    )


SAMPLE_STATS_SCHEMA = (
    "doc_id long, rate long, n_samples long, n_channels long, "
    "s_sum long, s_weighted long"
)


def _sample_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rate, arr = decode_wav(bytes(payload))
            s = arr.astype(np.int64)
            n, ch = s.shape
            # order-sensitive digest: (i·ch + c) mod 97 positional weight —
            # a decoder that deinterleaves wrong cannot hash-match
            w = (np.arange(s.size, dtype=np.int64) % 97).reshape(s.shape)
            rows.append(
                (int(doc_id), rate, n, ch, int(s.sum()), int((s * w).sum()))
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "rate", "n_samples", "n_channels",
                "s_sum", "s_weighted",
            ],
        )


def decode_sample_stats(blobs: DataFrame) -> DataFrame:
    """REAL WAV decode over the payload column, reduced to integer sample
    digests (layout-sensitive: interleave order is part of the weight) —
    the audio twin of multimodal.decode_pixel_stats."""
    return blobs.select("doc_id", "payload").mapInPandas(
        _sample_stats, schema=SAMPLE_STATS_SCHEMA
    )


FRAME_ENERGY_SCHEMA = "doc_id long, frame_idx long, n_frame long, energy long"


def _frame_energy(frame: int, hop: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, arr = decode_wav(bytes(payload))
                mono = arr.astype(np.int64).sum(axis=1)  # exact channel mix
                n = mono.shape[0]
                idx = 0
                start = 0
                while start + frame <= n:
                    seg = mono[start : start + frame]
                    rows.append(
                        (int(doc_id), idx, frame, int((seg * seg).sum()))
                    )
                    idx += 1
                    start += hop
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "n_frame", "energy"]
            )

    return gen


def frame_energy(blobs: DataFrame, frame: int = 128, hop: int = 64) -> DataFrame:
    """Windowed frame ENERGY over decoded PCM (sum of squares of the
    exact integer channel mix per hop-strided frame) — the canonical
    first feature of any audio pipeline (VAD thresholds, silence
    trimming, loudness filtering for training data). Stays integer end
    to end, so the SQL oracle recomputes every frame from the sample
    formula. Frames are FULL windows only (start + frame ≤ n) — the
    standard analysis convention, and the boundary the oracle mirrors."""
    return blobs.select("doc_id", "payload").mapInPandas(
        _frame_energy(frame, hop), schema=FRAME_ENERGY_SCHEMA
    )
