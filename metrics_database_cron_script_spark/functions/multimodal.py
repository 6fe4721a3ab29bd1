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
            arr = np.frombuffer(payload, dtype=np.uint8)
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
