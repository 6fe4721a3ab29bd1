"""Partitioning utilities — the knobs that matter at 100 TB.

`fan_out` fixes the small-input/expensive-operator mismatch: a table that
arrives in fewer partitions than cores (single parquet file locally; a
coalesced upstream stage on a cluster) serializes CPU-heavy per-row work
(explode, regex, hashing). One cheap round-robin shuffle of the *narrow*
input unlocks full parallelism for the expensive stage. It is a no-op when
the input is already wide enough, so it is safe to leave in scale-out paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_ratio: float = 0.5) -> DataFrame:
    """Repartition to the session's default parallelism iff the input has
    fewer than `min_ratio`× that many partitions."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target * min_ratio:
        return df.repartition(target)
    return df


def key_fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition on `keys` at exactly the session's shuffle width.
    Use before a window/agg partitioned on the same keys when the input may
    be a few fat splits (single-row-group files): the explicit exchange
    replaces the one Catalyst would insert anyway (ClusteredDistribution on
    the same keys — no second shuffle) and pulls the CPU-heavy per-key work
    out of the narrow scan stage.

    The width deliberately MATCHES `spark.sql.shuffle.partitions` (the
    engine's data-sized rule, sources/tables.py) rather than max()-ing with
    the core count: downstream exchanges use the conf width, and a mismatch
    (e.g. 32-wide repartition meeting a 4-wide join requirement) defeats
    ReuseExchange and buys an extra full shuffle — worse than the lost
    parallelism at the small end, and a non-issue at cluster scale where
    the conf width exceeds cores anyway."""
    sess = df.sparkSession
    n = int(sess.conf.get("spark.sql.shuffle.partitions", "200"))
    return df.repartition(n, *keys)
