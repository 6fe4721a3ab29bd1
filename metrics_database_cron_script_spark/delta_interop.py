"""Delta Lake interop for the snapshot/MERGE surface (round-6 verdict #5).

`versioned.VersionedSnapshot` is this engine's home-grown OCC table — the
commit-log protocol Delta/Iceberg use, reduced to its primitive. A real
lakehouse usually already RUNS one of those formats, so the upsert sites
(`state.snapshot_overwrite`, `VersionedSnapshot.merge_keep_latest`) must be
expressible through it. This module re-expresses the keep-latest MERGE,
snapshot overwrite, time travel and the CDF change feed through
``delta-spark`` when the runtime carries it, behind a dispatcher that tells
callers WHICH backend ran (the streaming `tws.run_running_totals_best`
pattern: tests assert the dispatch, never skip).

This image ships neither the ``delta`` python package nor the
``io.delta:delta-spark`` jar, so the delta path raises with the exact
bootstrap a cluster needs::

    spark-submit \
      --packages io.delta:delta-spark_2.13:4.0.0 \
      --conf spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension \
      --conf spark.sql.catalog.spark_catalog=\
org.apache.spark.sql.delta.catalog.DeltaCatalog \
      your_job.py

(the Scala suffix must match the Spark build; Spark 4.x ships Scala 2.13,
and delta-spark 4.x is the Spark-4-compatible line).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DELTA_BOOTSTRAP = (
    "--packages io.delta:delta-spark_2.13:4.0.0 "
    "--conf spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension "
    "--conf spark.sql.catalog.spark_catalog="
    "org.apache.spark.sql.delta.catalog.DeltaCatalog"
)


def delta_available(spark: SparkSession) -> bool:
    """True iff BOTH halves of delta-spark are present: the python package
    (`delta.tables`) and the jar (probed via the DeltaTable class on the
    JVM side — importing the python half succeeds even without the jar)."""
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError:
        return False
    try:
        jvm = spark._jvm
        jvm.java.lang.Class.forName("org.apache.spark.sql.delta.DeltaLog")
        return True
    except Exception:
        return False


def _require_delta(spark: SparkSession) -> None:
    if not delta_available(spark):
        raise NotImplementedError(
            "Delta Lake interop needs the delta-spark package AND jar; "
            f"bootstrap: spark-submit {DELTA_BOOTSTRAP} your_job.py "
            "(session extensions cannot be added to a running JVM). "
            "The OCC backend (versioned.VersionedSnapshot) covers the same "
            "semantics in this environment."
        )


class DeltaSnapshotTable:
    """`VersionedSnapshot`'s public surface re-expressed on Delta Lake:
    same keep-latest MERGE semantics (per-key max over order columns),
    same overwrite/time-travel/CDF behavior — asserted 1:1 against the
    OCC table by tests/test_delta_interop.py on jar-present environments.

    Tie contract: on a stored-vs-batch tie (equal order tuples) the STORED
    row wins on BOTH backends — here via the strictly-greater MERGE
    condition, on the OCC backend via a stored-first origin flag in the
    row_number ordering. Ties WITHIN one batch are unspecified on both
    backends unless `order_cols` totally orders the rows sharing a key.
    Callers that need batch-wins-on-equal must add
    an explicit tiebreaker column, as r_upsert_evolution does. Delta's own transaction log supplies the
    concurrency control the OCC table implements by hand, so there is no
    retry loop here: conflicting writers surface Delta's
    ConcurrentModificationException contract."""

    def __init__(self, spark: SparkSession, path: str):
        _require_delta(spark)
        self.spark = spark
        self.path = path

    # -- writes ------------------------------------------------------------
    def overwrite(self, df: DataFrame) -> None:
        (
            df.write.format("delta")
            .mode("overwrite")
            .option("overwriteSchema", "true")
            .option("delta.enableChangeDataFeed", "true")
            .save(self.path)
        )

    def merge_keep_latest(
        self, new: DataFrame, key: str, order_cols: list[str]
    ) -> None:
        """Keep-latest MERGE: the batch row wins iff its order tuple is
        strictly greater than the stored row's. Equal order tuples keep the
        STORED row on both backends — here by the strict `>` MERGE
        condition, on the OCC backend by the stored-first origin tiebreaker
        in `VersionedSnapshot.merge_keep_latest`'s window ordering (ties
        WITHIN one batch remain unspecified on both backends)."""
        from delta.tables import DeltaTable
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        # collapse the batch itself first (several updates for one key in
        # one batch), mirroring the OCC union+row_number semantics
        w = Window.partitionBy(key).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        batch = (
            new.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        tgt = DeltaTable.forPath(self.spark, self.path)
        newer = " OR ".join(
            # lexicographic strictly-greater over the order columns
            "("
            + " AND ".join(
                f"s.{order_cols[j]} = t.{order_cols[j]}" for j in range(i)
            )
            + (" AND " if i else "")
            + f"s.{order_cols[i]} > t.{order_cols[i]})"
            for i in range(len(order_cols))
        )
        (
            tgt.alias("t")
            .merge(batch.alias("s"), f"t.{key} = s.{key}")
            .whenMatchedUpdateAll(condition=newer)
            .whenNotMatchedInsertAll()
            .execute()
        )

    # -- reads -------------------------------------------------------------
    def read(self) -> DataFrame:
        return self.spark.read.format("delta").load(self.path)

    def read_version(self, version: int) -> DataFrame:
        return (
            self.spark.read.format("delta")
            .option("versionAsOf", version)
            .load(self.path)
        )

    def changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        reader = (
            self.spark.read.format("delta")
            .option("readChangeFeed", "true")
            .option("startingVersion", from_version + 1)
        )
        if to_version is not None:
            reader = reader.option("endingVersion", to_version)
        return reader.load(self.path)


# Iceberg carries the same commit-log semantics; its runtime jar is also
# absent from this image, so the interop surface is the bootstrap recipe
# plus the SQL each operation maps to (MERGE INTO / VERSION AS OF /
# changelog reads are catalog-level SQL in Iceberg, not a DataFrame API,
# so unlike Delta there is no python package half to wrap offline).
ICEBERG_BOOTSTRAP = (
    "--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 "
    "--conf spark.sql.extensions="
    "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions "
    "--conf spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog "
    "--conf spark.sql.catalog.local.type=hadoop "
    "--conf spark.sql.catalog.local.warehouse=<warehouse path>"
)


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime jar is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def snapshot_table(spark: SparkSession, path: str, format: str = "auto"):
    """Environment-dispatched snapshot table: (table, backend) where
    backend ∈ {"delta", "occ"}. `format="auto"` prefers Delta when the
    runtime carries it (interop with the lakehouse's existing log) and
    falls back to the OCC table; an explicit `format="delta"` on a
    jar-less runtime raises the bootstrap recipe instead of silently
    degrading. `format="iceberg"` likewise raises its bootstrap when the
    runtime jar is absent (when present, keep-latest MERGE maps to
    `MERGE INTO ... WHEN MATCHED AND s.ord > t.ord THEN UPDATE`, time
    travel to `VERSION AS OF`, CDF to the changelog read — catalog-level
    SQL, so there is no offline wrapper class to ship). Callers/tests
    assert the returned backend — dispatch is an environment fact, never
    a skipped test."""
    if format not in ("auto", "delta", "occ", "iceberg"):
        raise ValueError(f"unknown format {format!r}")
    if format == "iceberg":
        # No wrapper class exists in EITHER jar state (Iceberg's surface
        # here is catalog-level SQL): an explicit iceberg request must
        # never silently dispatch to another backend. Jar-absent gets the
        # bootstrap; jar-present gets the SQL mapping to use instead.
        if not iceberg_available(spark):
            raise NotImplementedError(
                "Iceberg interop needs the Spark runtime jar; bootstrap: "
                f"spark-submit {ICEBERG_BOOTSTRAP} your_job.py. The OCC "
                "backend covers the same semantics in this environment."
            )
        raise NotImplementedError(
            "Iceberg runtime detected, but this engine ships no Iceberg "
            "wrapper class — the operations are catalog-level SQL on your "
            "Iceberg table: keep-latest MERGE = `MERGE INTO t USING s ON "
            "t.key = s.key WHEN MATCHED AND s.ord > t.ord THEN UPDATE SET "
            "* WHEN NOT MATCHED THEN INSERT *`; time travel = `SELECT ... "
            "VERSION AS OF <snapshot>`; change feed = the changelog read. "
            "Use spark.sql directly, or format='occ'/'delta'."
        )
    if format == "delta" or (format == "auto" and delta_available(spark)):
        return DeltaSnapshotTable(spark, path), "delta"
    from metrics_database_cron_script_spark.versioned import VersionedSnapshot

    return VersionedSnapshot(spark, path), "occ"
