"""Versioned snapshot table with optimistic concurrency control.

`state.snapshot_overwrite` is correct under the reference's own operating
model — one cron process (updatescript.py runs single-threaded, once a day).
This module is the CONCURRENT-WRITER upgrade the plain directory swap cannot
give: the same protocol Delta Lake / Iceberg use, reduced to its primitive —
immutable versioned data + an atomic exclusive-create commit log that picks
exactly one winner per version.

Layout:

    <path>/_log/<version 20d>.commit   -- zero-byte marker, O_CREAT|O_EXCL
    <path>/_v<version 20d>/            -- immutable parquet snapshot

Protocol (writer):
  1. observe committed version v (max marker with an existing data dir);
  2. write the new snapshot to `_v{v+1}` (crash here leaves an ORPHAN dir —
     invisible to readers, reaped by `vacuum`);
  3. exclusive-create `_log/{v+1}.commit`. Exactly one concurrent writer
     succeeds; the loser raises `ConcurrentWriteError` (or retries its whole
     read-modify-write in `merge_keep_latest`).

The commit marker is created ONLY AFTER its data dir is fully written, so a
marker implies readable data; a data dir without a marker is an aborted
write. O_EXCL is atomic on POSIX and HDFS; on S3-class stores the same slot
needs a conditional PUT / DynamoDB mutex — exactly Delta's deployment
matrix. Readers never block writers and vice versa (snapshot isolation:
a reader resolves a version once and reads an immutable directory).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class ConcurrentWriteError(RuntimeError):
    """Another writer committed the version this writer raced for."""


class VersionedSnapshot:
    """Keep-latest snapshot table with OCC (reference R9 `update_one` upsert,
    updatescript.py:131 — safe under concurrent writers, unlike the
    single-writer `state.snapshot_overwrite`)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self.log_dir = os.path.join(self.path, "_log")

    # ------------------------------------------------------------- versions

    def _data_dir(self, version: int) -> str:
        return os.path.join(self.path, f"_v{version:020d}")

    def _marker(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:020d}.commit")

    def version(self) -> int:
        """Latest committed version, or -1 for an empty table. The commit
        markers alone DEFINE the version sequence; a marker whose data dir
        was deleted out-of-band is corruption and surfaces as a read error
        on that version, never as a silent fallback to an older snapshot."""
        return max(self.history(), default=-1)

    def history(self) -> list[int]:
        """All committed versions, ascending — those still readable are the
        ones `vacuum`'s retention window kept."""
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for name in os.listdir(self.log_dir):
            if name.endswith(".commit"):
                try:
                    out.append(int(name[: -len(".commit")]))
                except ValueError:
                    continue
        return sorted(out)

    # ---------------------------------------------------------------- reads

    def read(self, schema=None, version: int | None = None) -> DataFrame:
        """Snapshot-isolated read — the latest committed version by default,
        or time travel to an explicit `version` (must be committed and not
        vacuumed). An empty typed DataFrame for a never-committed table
        (requires `schema` — a DDL string or a StructType)."""
        if version is not None:
            hist = self.history()
            if version not in hist:
                raise FileNotFoundError(
                    f"versioned table {self.path} has no committed version "
                    f"{version}; history: {hist}"
                )
            if not os.path.isdir(self._data_dir(version)):
                raise FileNotFoundError(
                    f"versioned table {self.path} version {version} was "
                    "vacuumed (or its data dir was deleted out-of-band)"
                )
            return self.spark.read.parquet(self._data_dir(version))
        v = self.version()
        if v < 0:
            if schema is None:
                raise FileNotFoundError(
                    f"versioned table {self.path} has no committed version "
                    "and no bootstrap schema was given"
                )
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(self._data_dir(v))

    # --------------------------------------------------------------- writes

    def overwrite(self, df: DataFrame, expected_version: int | None = None) -> int:
        """Commit `df` as the next version. `expected_version` (from
        `version()` at the start of the caller's read-modify-write) makes
        the commit conditional: if anyone committed in between, raise
        instead of silently overwriting their update. Returns the new
        version."""
        observed = self.version()
        if expected_version is not None and observed != expected_version:
            raise ConcurrentWriteError(
                f"{self.path}: expected version {expected_version}, found "
                f"{observed} — another writer committed; re-read and retry"
            )
        target = observed + 1
        data = self._data_dir(target)
        if os.path.isdir(data):
            # a racer (or a crashed past attempt) already staged this slot;
            # stage under a unique suffix then rename into place is NOT safe
            # for directories cross-writer — simplest correct move is to
            # treat the slot as contended
            raise ConcurrentWriteError(
                f"{self.path}: version {target} data dir already staged by "
                "another writer — re-read and retry"
            )
        df.write.mode("overwrite").parquet(data)
        os.makedirs(self.log_dir, exist_ok=True)
        try:
            fd = os.open(self._marker(target), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            shutil.rmtree(data, ignore_errors=True)  # lost the race: clean our stage
            raise ConcurrentWriteError(
                f"{self.path}: version {target} was committed by another "
                "writer — re-read and retry"
            ) from None
        return target

    def merge_keep_latest(
        self,
        new: DataFrame,
        key: str,
        order_cols: list[str],
        max_retries: int = 5,
    ) -> int:
        """R9 keep-latest MERGE under OCC: read the snapshot, union the
        batch, keep the max-`order_cols` row per `key`, commit conditionally;
        on a lost race re-read (now INCLUDING the winner's rows) and retry —
        no update is ever silently dropped. Returns the committed version."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        last_err: ConcurrentWriteError | None = None
        for _ in range(max_retries):
            v = self.version()
            base = (
                self.read()
                if v >= 0
                else self.spark.createDataFrame([], new.schema)
            )
            merged = base.unionByName(new, allowMissingColumns=True)
            w = Window.partitionBy(key).orderBy(
                *[F.col(c).desc() for c in order_cols]
            )
            latest = (
                merged.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            # materialize BEFORE commit: the plan reads version v's files,
            # which stay immutable — but localCheckpoint also keeps the
            # write cost out of the race window
            staged = latest.localCheckpoint(eager=True)
            try:
                return self.overwrite(staged, expected_version=v)
            except ConcurrentWriteError as e:
                last_err = e
                continue
        raise last_err  # type: ignore[misc]

    # ----------------------------------------------------------- maintenance

    def vacuum(self, keep: int = 2) -> list[str]:
        """Drop data dirs of superseded versions (keeping the latest `keep`)
        and ORPHAN data dirs (staged by crashed/defeated writers, no commit
        marker). Returns the removed paths. Safe against readers of retained
        versions; like Delta's VACUUM, a reader pinned to an ancient version
        can lose it — `keep` is the retention window."""
        current = self.version()
        removed = []
        if not os.path.isdir(self.path):
            return removed
        committed = set(self.history())
        for name in os.listdir(self.path):
            if not name.startswith("_v"):
                continue
            try:
                v = int(name[2:])
            except ValueError:
                continue
            orphan = v not in committed
            superseded = v <= current - keep
            if orphan or superseded:
                p = os.path.join(self.path, name)
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
        return removed
