"""Table maintenance: small-file compaction for append-heavy sinks.

The idempotent-append sink (state.py) adds files every cron run; after
months of daily batches a 100 TB table becomes millions of small files and
scan planning + open() overhead dominates. `compact` rewrites a parquet
directory to ~`target_mb` files using the same directory-swap the snapshot
writer uses (readers never see a half-written table; the swap is a rename).

Sizing: output partition count = ceil(input_bytes / target_mb), from the
actual on-disk footprint. Local paths are sized with os.walk; on a real
cluster the same arithmetic runs on the FileSystem API (the call site is
isolated here so the swap-in is one function). `repartition(n)` (round-
robin) is used rather than `coalesce(n)`: coalesce would skip the shuffle
but chains upstream partitioning into the write and produces skewed files
when input files are skewed — for a maintenance rewrite, evenly-sized
output is the point.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def parquet_file_count(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def leaf_parquet_dirs(path: str) -> list[str]:
    """Directories that directly contain parquet files — one per partition
    for a `partitionBy` layout, just [path] for a flat table."""
    leaves = []
    for root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            leaves.append(root)
    return sorted(leaves)


def compact(
    spark: SparkSession, path: str, target_mb: int = 64, min_files: int = 2
) -> int:
    """Rewrite the parquet table at `path` into ~target_mb files and return
    the new file count. Partition-aware: each leaf partition directory is
    compacted independently (a whole-table read would inline the partition
    columns and destroy the `partitionBy` layout — and per-leaf rewrites
    are also the unit a cluster would parallelize/ratelimit). No-op per
    leaf when it already has fewer than `min_files` files."""
    # All staging lives OUTSIDE the table root: tmp/old dirs inside it
    # would be picked up by partition inference as phantom partitions
    # (duplicated rows / conflicting-structure errors for any concurrent
    # reader) and a crashed run's leftovers would look like real leaves to
    # the next compaction. Leftover staging from a crashed run is reaped
    # here; the swap itself leaves only the between-renames window in
    # which one partition is briefly absent — this op assumes the same
    # single-maintenance-writer window as the rest of state.py, and the
    # snapshot-isolated variant is VersionedSnapshot.compact_partitions.
    base = path.rstrip("/")
    parent, name = os.path.split(base)
    for n in os.listdir(parent or "."):
        if n.startswith(f"{name}.__compact-"):
            shutil.rmtree(os.path.join(parent, n), ignore_errors=True)
    staging = f"{base}.__compact-{uuid.uuid4().hex[:8]}"
    try:
        for leaf in leaf_parquet_dirs(path):
            n_files = parquet_file_count(leaf)
            if n_files < min_files:
                continue
            total = dir_bytes(leaf)
            n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
            if n_out >= n_files:
                continue
            df = spark.read.parquet(leaf)
            rel = os.path.relpath(leaf, base)
            if rel == ".":  # flat table: the leaf IS the root
                rel = "__root__"
            tmp = os.path.join(staging, "tmp", rel)
            old = os.path.join(staging, "old", rel)
            df.repartition(n_out).write.mode("overwrite").parquet(tmp)
            os.makedirs(os.path.dirname(old), exist_ok=True)
            os.rename(leaf, old)
            os.rename(tmp, leaf)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return parquet_file_count(path)
