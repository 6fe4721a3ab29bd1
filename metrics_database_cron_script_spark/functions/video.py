"""Video columns: native RIFF/AVI (uncompressed DIB frames) codec +
Arrow-batched frame extraction.

Completes the multimodal family's native-codec set (images:
multimodal.py BMP/PNG/JPEG; audio: audio.py WAV/PCM): AVI is the RIFF
container every tool writes, and its uncompressed form ('DIB ' video
stream, 24-bit BI_RGB '00db' movi chunks — each frame a BMP pixel body:
bottom-up rows, BGR, 4-byte row padding) is fully specified without a
codec library. Compressed video (H.264 et al.) is out of native scope by
design — at 100 TB the engine's job is the CONTAINER walk, frame
selection and batch plumbing; hardware/library decoders slot into the
same mapInPandas shape.

Exactness contract for the oracles: synthetic AVIs carry pixels that are
a pure integer function of (doc_id, frame_idx, x, y, c), so a SQL oracle
recomputes every per-frame digest — a container-walk, frame-boundary,
row-order or channel-order bug cannot hash-match."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_RIFF = b"RIFF"


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""  # RIFF chunks are word-aligned
    return tag + len(body).to_bytes(4, "little") + body + pad


def _lst(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Encode equal-shaped (H, W, 3) uint8 RGB frames as an uncompressed
    AVI: LIST hdrl (avih + LIST strl(strh 'vids'/'DIB ' + strf
    BITMAPINFOHEADER 24bpp), LIST movi of '00db' DIB frames, idx1. Every
    frame body is the classic BMP pixel layout (bottom-up, BGR, rows
    padded to 4 bytes)."""
    import struct

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError(f"ragged frame shapes: {f.shape} vs {(h, w, 3)}")
    row_bytes = (w * 3 + 3) & ~3
    frame_size = row_bytes * h

    def dib(frame: np.ndarray) -> bytes:
        body = np.zeros((h, row_bytes), dtype=np.uint8)
        body[:, : w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)
        return body.tobytes()

    avih = struct.pack(
        "<10I",
        1_000_000 // fps,   # microseconds per frame
        frame_size * fps,   # max bytes per second
        0, 0x10,            # padding, flags (AVIF_HASINDEX)
        len(frames), 0, 1,  # total frames, initial frames, streams
        frame_size, w, h,
    ) + b"\x00" * 16
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII",
            0, 0, 0, 0,           # flags, priority+language, initial frames, scale↓
            1, fps,               # scale, rate → fps
            0, len(frames), frame_size, 0xFFFFFFFF, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0
    )
    hdrl = _lst(
        b"hdrl",
        _chunk(b"avih", avih)
        + _lst(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_bodies = [dib(f) for f in frames]
    movi_frames = [_chunk(b"00db", body) for body in movi_bodies]
    movi = _lst(b"movi", b"".join(movi_frames))
    # idx1: one entry per frame, offsets relative to the start of 'movi';
    # entry size is the UNPADDED body length, recorded directly from the
    # body (deriving it from the padded chunk length mis-sizes odd-length
    # bodies by the pad byte for external readers)
    idx, off = [], 4
    for mf, body in zip(movi_frames, movi_bodies):
        idx.append(b"00db" + (0x10).to_bytes(4, "little")
                   + off.to_bytes(4, "little")
                   + len(body).to_bytes(4, "little"))
        off += len(mf)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", b"".join(idx))
    return _RIFF + len(body).to_bytes(4, "little") + body


def decode_avi(payload: bytes) -> list[np.ndarray]:
    """Decode an uncompressed 24-bit AVI to its list of (H, W, 3) uint8
    RGB frames: RIFF walk to LIST hdrl (strf gives the BITMAPINFOHEADER —
    24bpp BI_RGB only) and LIST movi ('00db'/'01db' DIB chunks; '00dc'
    compressed chunks are refused). Raises ValueError on any other
    flavor or corrupt structure rather than returning garbage frames."""
    import struct

    if payload[:4] != _RIFF or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = None
    topdown = False
    frames: list[np.ndarray] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal w, h, topdown
        while pos + 8 <= end:
            tag = buf[pos : pos + 4]
            (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_start = pos + 8
            if body_start + length > end:
                raise ValueError(f"truncated AVI chunk {tag!r}")
            if tag == b"LIST":
                walk(buf, body_start + 4, body_start + length)
            elif tag == b"strf":
                if length < 40:
                    raise ValueError("short strf BITMAPINFOHEADER")
                (_sz, bw, bh, _planes, bpp, comp) = struct.unpack(
                    "<IiiHHI", buf[body_start : body_start + 20]
                )
                if bpp != 24 or comp != 0:
                    raise ValueError(
                        f"unsupported AVI video: bpp={bpp} compression={comp} "
                        "(uncompressed 24-bit DIB only)"
                    )
                # negative biHeight = top-down DIB (rows stored first-row
                # -first) — decode it as such instead of silently flipping
                w, h, topdown = bw, abs(bh), bh < 0
            elif tag in (b"00db", b"01db"):
                if w is None:
                    raise ValueError("frame chunk before strf header")
                row_bytes = (w * 3 + 3) & ~3
                if length != row_bytes * h:
                    raise ValueError(
                        f"frame size {length} != {row_bytes * h} for {w}x{h}"
                    )
                body = np.frombuffer(
                    buf, dtype=np.uint8, count=length, offset=body_start
                ).reshape(h, row_bytes)[:, : w * 3]
                rgb = body.reshape(h, w, 3)[:, :, ::-1]
                frames.append((rgb if topdown else rgb[::-1]).copy())
            elif tag in (b"00dc", b"01dc"):
                raise ValueError(
                    "compressed AVI frame chunks unsupported (DIB only)"
                )
            pos = body_start + length + (length & 1)

    walk(payload, 12, len(payload))
    if w is None:
        raise ValueError("missing strf video header")
    if not frames:
        raise ValueError("no video frames in movi")
    return frames


# ------------------------------------------- synthetic videos + digests

def synth_video_dims(doc_id: int) -> tuple[int, int, int]:
    """(w, h, n_frames): 8-16 × 6-8 px, 2-4 frames."""
    return 8 + 4 * (doc_id % 3), 6 + 2 * (doc_id % 2), 2 + doc_id % 3


def synth_video_frames(doc_id: int) -> list[np.ndarray]:
    """Frame t pixel (x, y, c) = (doc_id·29 + t·59 + x·7 + y·13 + c·101)
    mod 256 — mirrored literally by the SQL oracles."""
    w, h, n = synth_video_dims(doc_id)
    x = np.arange(w, dtype=np.int64)[None, :, None]
    y = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return [
        ((doc_id * 29 + t * 59 + x * 7 + y * 13 + c * 101) % 256).astype(
            np.uint8
        )
        for t in range(n)
    ]


def _synth_avis(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids = pdf["doc_id"].tolist()
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "payload": [
                    encode_avi(synth_video_frames(int(d))) for d in ids
                ],
            }
        )


def synthetic_avi_blobs(docs: DataFrame) -> DataFrame:
    """doc_id → real RIFF/AVI bytes (hdrl + movi + idx1), one per doc."""
    return docs.select("doc_id").mapInPandas(
        _synth_avis, schema="doc_id long, payload binary"
    )


def _synth_avis_stemmed(mod: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        encode_avi(synth_video_frames(int(d) - int(d) % mod))
                        for d in ids
                    ],
                }
            )

    return gen


def synthetic_avi_blobs_stemmed(docs: DataFrame, mod: int = 4) -> DataFrame:
    """doc_id → AVI bytes synthesized from the doc's STEM (doc_id −
    doc_id % mod): every `mod` consecutive docs carry byte-identical
    video — the deterministic duplicate plant for the dedup queries."""
    return docs.select("doc_id").mapInPandas(
        _synth_avis_stemmed(mod), schema="doc_id long, payload binary"
    )


def _synth_avis_perturbed(mod: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            out = []
            for d in ids:
                d = int(d)
                r = d % mod
                frames = synth_video_frames(d - r)
                if r:
                    # complement the first r channel values of frame 0's
                    # corner pixel — one frame differs, the rest shared
                    frames = [f.copy() for f in frames]
                    frames[0][0, 0, :r] = 255 - frames[0][0, 0, :r]
                out.append(encode_avi(frames))
            yield pd.DataFrame({"doc_id": ids, "payload": out})

    return gen


def synthetic_avi_blobs_perturbed(docs: DataFrame, mod: int = 4) -> DataFrame:
    """doc_id → AVI of the doc's STEM video with (doc_id % mod) corner
    channel values of FRAME 0 complemented: videos within a stem share
    every frame except (possibly) frame 0 — the near-dup plant for
    x_video_frame_neardup (trimmed/retouched-copy shape)."""
    return docs.select("doc_id").mapInPandas(
        _synth_avis_perturbed(mod), schema="doc_id long, payload binary"
    )


def video_frame_neardup_pairs(
    blobs: DataFrame, threshold: float = 0.25
) -> DataFrame:
    """NEAR-duplicate video pairs by FRAME-SET Jaccard — frames are the
    shingles (round 9, the video twin of text n-gram Jaccard): each
    decoded frame reduces to its exact integer digest (dims + pixel sum +
    position-weighted sum), candidate pairs come from an EQUI-JOIN on the
    frame digest (two videos sharing zero frames never meet — the same
    never-all-pairs invariant every dedup operator here keeps), and
    jaccard = |shared| / (|A| + |B| − |shared|) over DISTINCT frame
    digests. Catches retouched/extended copies whose containers and
    order-sensitive fingerprints (video_exact_dedup) differ. At corpus
    scale the shuffle key is a ~32-byte digest tuple; bucket growth is
    bounded by true duplicate structure, as with text shingles."""
    from pyspark.sql import functions as F

    digest_cols = ["width", "height", "px_sum", "px_weighted"]
    d = (
        decode_frame_stats(blobs, every_k=1)
        .select("doc_id", *digest_cols)
        .distinct()
    )
    sizes = d.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nf"))
    a = d.select(F.col("doc_id").alias("doc_a"), *digest_cols)
    b = d.select(F.col("doc_id").alias("doc_b"), *digest_cols)
    shared = (
        a.join(b, digest_cols)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nf").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nf").alias("nb"))
    return (
        shared.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared",
            (
                F.col("shared")
                / (F.col("na") + F.col("nb") - F.col("shared"))
            ).alias("_jaccard_raw"),
        )
        # Filter on the UNROUNDED ratio — the same boundary the SQL
        # oracle uses — then round only in the projected column. Filtering
        # on the rounded value would keep pairs whose true jaccard lies in
        # [threshold - 5e-7, threshold) that the oracle drops.
        .filter(F.col("_jaccard_raw") >= threshold)
        .select(
            "doc_a",
            "doc_b",
            "shared",
            F.round(F.col("_jaccard_raw"), 6).alias("jaccard"),
        )
    )


def video_exact_dedup(blobs: DataFrame) -> DataFrame:
    """Exact VIDEO dedup over DECODED content (round 9): the fingerprint
    is the per-frame digest stream folded ORDER-SENSITIVELY — n_frames,
    dims, total pixel sum, and sum(px_weighted · (frame_idx % 89 + 1)) —
    so two videos with the same frames in a different order separate
    (plain sums commute; the frame-position factor does not). One
    container-walk pass, then a groupBy on a 5-integer key: the shuffle
    carries ~40 bytes per video regardless of payload size."""
    from pyspark.sql import functions as F

    stats = decode_frame_stats(blobs, every_k=1)
    fp = stats.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.min("width").alias("width"),
        F.min("height").alias("height"),
        F.sum("px_sum").alias("px_total"),
        F.sum(
            F.col("px_weighted") * (F.col("frame_idx") % 89 + 1)
        ).alias("px_ordered"),
    )
    return fp.groupBy(
        "n_frames", "width", "height", "px_total", "px_ordered"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("rep_doc"),
    )


FRAME_STATS_SCHEMA = (
    "doc_id long, frame_idx long, width long, height long, "
    "px_sum long, px_weighted long"
)


def _frame_stats(every_k: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_avi(bytes(payload))
                for t in range(0, len(frames), every_k):
                    img = frames[t].astype(np.int64)
                    fh, fw = img.shape[:2]
                    wgt = (np.arange(img.size, dtype=np.int64) % 97).reshape(
                        img.shape
                    )
                    rows.append(
                        (
                            int(doc_id), t, fw, fh,
                            int(img.sum()), int((img * wgt).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "width", "height",
                    "px_sum", "px_weighted",
                ],
            )

    return gen


def decode_frame_stats(blobs: DataFrame, every_k: int = 1) -> DataFrame:
    """REAL AVI decode over the payload column, reduced to per-frame
    position-weighted pixel digests; `every_k` keeps every k-th frame
    (keyframe sampling — the standard frame-subsample pass of a video
    training pipeline), applied AFTER the container walk so the sampling
    boundary itself is oracle-checked."""
    return blobs.select("doc_id", "payload").mapInPandas(
        _frame_stats(every_k), schema=FRAME_STATS_SCHEMA
    )
