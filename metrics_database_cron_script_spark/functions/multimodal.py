"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is an opaque
`BinaryType` column (or a (path, offset, length) pointer into blob storage),
metadata is a typed struct, and all per-item decode/feature work runs as
Arrow-batched `mapInPandas` so Python touches data only in columnar batches.

This container has no image/audio libraries, so the *decode* step is stubbed
(`decode_image` raises NotImplementedError unless PIL is importable — clearly
marked); the Spark-side plumbing — schema, batch shape, UDF signatures,
byte-level feature extraction — is real and tested. Byte-level features
(length, histograms, means) are computed for real: they don't need a codec.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_mean double, byte_min long, byte_max long"
)


def blob_table(docs: DataFrame) -> DataFrame:
    """documents → multimodal-shaped table: binary payload + typed metadata
    struct. (Fixtures have no real media; utf-8 text bytes stand in as the
    opaque payload — the plumbing is identical.)"""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """STUB: real image decode needs PIL/libvips, absent in this container."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decode requires PIL; install pillow on the cluster image"
        ) from exc


def _byte_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over binary payloads. This is the
    exact shape a real decode/resize/frame-sample UDF takes — swap the numpy
    byte stats for PIL/ffmpeg calls on a cluster with codecs installed."""
    for pdf in batches:
        feats = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            # NULL payloads arrive as None; np.frombuffer(None) raises —
            # treat like an empty blob instead of killing the task
            arr = np.frombuffer(payload or b"", dtype=np.uint8)
            feats.append(
                (
                    doc_id,
                    int(arr.size),
                    float(arr.mean()) if arr.size else 0.0,
                    int(arr.min()) if arr.size else 0,
                    int(arr.max()) if arr.size else 0,
                )
            )
        yield pd.DataFrame(
            feats, columns=["doc_id", "n_bytes", "byte_mean", "byte_min", "byte_max"]
        )


def byte_feature_extract(blobs: DataFrame) -> DataFrame:
    """mapInPandas over the payload column — partition-parallel, Arrow
    transfer, no driver involvement."""
    return blobs.select("doc_id", "payload").mapInPandas(
        _byte_features, schema=FEATURE_SCHEMA
    )


def multimodal_meta(docs: DataFrame) -> DataFrame:
    """Pure-JVM metadata projection over the blob table (no Python): byte
    length + typed meta fields — the cheap scan that prunes before decode."""
    blobs = blob_table(docs)
    return blobs.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.col("meta.lang").alias("lang"),
        F.col("meta.source").alias("source"),
        F.col("meta.mime").alias("mime"),
    )


FRAME_SCHEMA = "doc_id long, frame_idx long, frame binary"
RESIZE_SCHEMA = "doc_id long, resized binary, orig_bytes long"


def _frame_sample(frame_size: int, every_k: int):
    """Frame sampling over opaque payloads: split each blob into fixed-size
    frames, keep every k-th — the video-keyframe-extraction batch shape
    (swap the byte slicing for ffmpeg/pyav on a cluster with codecs)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = payload or b""  # NULL blob: zero frames
                frames = [
                    payload[i : i + frame_size]
                    for i in range(0, len(payload), frame_size)
                ]
                for idx in range(0, len(frames), every_k):
                    out.append((doc_id, idx, frames[idx]))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame"])

    return gen


def frame_sample(blobs: DataFrame, frame_size: int = 64, every_k: int = 4) -> DataFrame:
    return blobs.select("doc_id", "payload").mapInPandas(
        _frame_sample(frame_size, every_k), schema=FRAME_SCHEMA
    )


def _resize(target_bytes: int):
    """'Resize' over opaque payloads: uniform byte subsampling to a fixed
    length — the image-thumbnailing batch shape (swap for PIL.resize)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload or b"", dtype=np.uint8)
                if arr.size == 0:
                    out.append((doc_id, b"", 0))
                    continue
                idx = np.linspace(0, arr.size - 1, num=min(target_bytes, arr.size))
                out.append((doc_id, arr[idx.astype(int)].tobytes(), int(arr.size)))
            yield pd.DataFrame(out, columns=["doc_id", "resized", "orig_bytes"])

    return gen


def resize_bytes(blobs: DataFrame, target_bytes: int = 32) -> DataFrame:
    return blobs.select("doc_id", "payload").mapInPandas(
        _resize(target_bytes), schema=RESIZE_SCHEMA
    )
