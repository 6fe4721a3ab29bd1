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


def _collapse_batch(new: DataFrame, key: str, order_cols: list[str]) -> DataFrame:
    """Collapse several updates for one key within a batch to the
    max-order row, mirroring the OCC union+row_number semantics. Shared by
    the Delta and Iceberg MERGE wrappers so the tie contract cannot drift
    between backends."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        new.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _strictly_newer_sql(order_cols: list[str]) -> str:
    """Lexicographic strictly-greater predicate `s.* > t.*` over the order
    columns — the MERGE condition that makes the STORED row win ties on
    both SQL backends."""
    return " OR ".join(
        "("
        + " AND ".join(
            f"s.{order_cols[j]} = t.{order_cols[j]}" for j in range(i)
        )
        + (" AND " if i else "")
        + f"s.{order_cols[i]} > t.{order_cols[i]})"
        for i in range(len(order_cols))
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

        tgt = DeltaTable.forPath(self.spark, self.path)
        (
            tgt.alias("t")
            .merge(
                _collapse_batch(new, key, order_cols).alias("s"),
                f"t.{key} = s.{key}",
            )
            .whenMatchedUpdateAll(condition=_strictly_newer_sql(order_cols))
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
# absent from this image. Unlike Delta there is no python package half to
# probe — everything is catalog-level SQL — so the wrapper below
# (IcebergSnapshotTable) is pure SQL generation over a catalog identifier,
# constructible only when the runtime jar is present.
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


def _require_iceberg(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg interop needs the Spark runtime jar; bootstrap: "
            f"spark-submit {ICEBERG_BOOTSTRAP} your_job.py. The OCC "
            "backend (versioned.VersionedSnapshot) covers the same "
            "semantics in this environment."
        )


class IcebergSnapshotTable:
    """`VersionedSnapshot`'s public surface on an Iceberg CATALOG TABLE
    (round-6 verdict item 5, mirroring DeltaSnapshotTable): keep-latest
    MERGE via `MERGE INTO ... WHEN MATCHED AND s.ord > t.ord`, snapshot
    overwrite via DataFrameWriterV2 `createOrReplace`, time travel via
    `VERSION AS OF <snapshot_id>`, the change feed via the
    `system.create_changelog_view` procedure. Tie contract identical to
    the Delta and OCC backends: the stored row wins equal order tuples
    (the shared `_strictly_newer_sql` predicate).

    Iceberg tables are CATALOG-addressed, not path-addressed, so the
    wrapper takes a fully-qualified identifier (`catalog.db.table` — the
    catalog component also hosts the changelog procedure). `version` in
    `read_version`/`changes` is the ORDINAL snapshot index in commit
    order (0 = first commit), aligned with the OCC/Delta version numbers
    the parity test compares; the mapping to Iceberg's random snapshot
    ids goes through the `<table>.snapshots` metadata relation.

    Constructible only when the runtime jar is present (`_require_iceberg`
    raises the bootstrap otherwise); semantics are asserted 1:1 against
    the OCC table by tests/test_iceberg_interop.py on jar-present
    environments — on this image (no jar) the dispatch/refusal contract is
    what executes."""

    def __init__(self, spark: SparkSession, identifier: str):
        _require_iceberg(spark)
        if len(identifier.split(".")) != 3:
            raise ValueError(
                f"Iceberg identifier must be catalog.db.table, got "
                f"{identifier!r} (the catalog component addresses the "
                "changelog procedure)"
            )
        self.spark = spark
        self.identifier = identifier
        self.catalog = identifier.split(".")[0]
        # changelog view names created by changes(), pending cleanup —
        # the view namespace is session-global, so a long-lived session
        # (the cron shape) must be able to drop them deterministically
        self._changelog_views: list[str] = []

    # -- writes ------------------------------------------------------------
    def overwrite(self, df: DataFrame) -> None:
        df.writeTo(self.identifier).using("iceberg").createOrReplace()

    def merge_keep_latest(
        self, new: DataFrame, key: str, order_cols: list[str]
    ) -> None:
        """Keep-latest MERGE, same contract as the Delta/OCC backends:
        batch wins iff strictly newer; stored row keeps ties."""
        batch = _collapse_batch(new, key, order_cols)
        # per-CALL uuid view (matching changes()): a name derived from the
        # identifier is deterministic per table — two concurrent merges in
        # one session (or a hash collision across tables) would overwrite
        # each other's source view between createOrReplaceTempView and the
        # MERGE; the view namespace is session-global, not per-table
        import uuid as _uuid

        view = f"__iceberg_merge_src_{_uuid.uuid4().hex[:12]}"
        batch.createOrReplaceTempView(view)
        try:
            self.spark.sql(
                f"MERGE INTO {self.identifier} t USING {view} s "
                f"ON t.{key} = s.{key} "
                f"WHEN MATCHED AND ({_strictly_newer_sql(order_cols)}) "
                "THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        finally:
            self.spark.catalog.dropTempView(view)

    # -- reads -------------------------------------------------------------
    def read(self) -> DataFrame:
        return self.spark.table(self.identifier)

    def _snapshot_ids(self) -> list[int]:
        """Snapshot ids in commit order — the ordinal-version mapping.
        Ordered by the parent_id LINEAGE, not by committed_at alone: two
        commits can land in the same millisecond (overwrite immediately
        followed by MERGE — exactly the parity-test sequence), and a
        timestamp sort would then map ordinals nondeterministically.
        committed_at order is the fallback only for chains broken by
        snapshot expiry (the expired prefix is unreadable anyway)."""
        rows = (
            self.spark.table(f"{self.identifier}.snapshots")
            .select("snapshot_id", "parent_id", "committed_at")
            .collect()
        )
        by_parent = {r["parent_id"]: r["snapshot_id"] for r in rows}
        ids = {r["snapshot_id"] for r in rows}
        chain: list[int] = []
        # the root is the snapshot whose parent is absent (None or expired)
        cur = next(
            (r["snapshot_id"] for r in rows if r["parent_id"] not in ids),
            None,
        )
        while cur is not None and cur not in chain:
            chain.append(cur)
            cur = by_parent.get(cur)
        if len(chain) == len(rows):
            return chain
        # branched/expired history: deterministic fallback
        return [
            r["snapshot_id"]
            for r in sorted(
                rows, key=lambda r: (r["committed_at"], r["snapshot_id"])
            )
        ]

    def read_version(self, version: int) -> DataFrame:
        sid = self._snapshot_ids()[version]
        return self.spark.sql(
            f"SELECT * FROM {self.identifier} VERSION AS OF {sid}"
        )

    def changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Row-level changes AFTER `from_version` (exclusive, matching the
        Delta wrapper's startingVersion = from+1), via the Iceberg Spark
        changelog procedure; rows carry _change_type in {INSERT, DELETE,
        UPDATE_BEFORE, UPDATE_AFTER}."""
        import uuid as _uuid

        ids = self._snapshot_ids()
        opts = [f"'start-snapshot-id', '{ids[from_version]}'"]
        if to_version is not None:
            opts.append(f"'end-snapshot-id', '{ids[to_version]}'")
        # per-CALL view name (two interleaved changes() on one table must
        # not read each other's range). The view is LEFT IN PLACE: dropping
        # it after forcing df.schema relies on analysis inlining the view
        # definition, which is not guaranteed to survive a re-analysis
        # (cache invalidation, session cloning, adaptive re-resolution) —
        # and this path can't be integration-tested on a jar-less image,
        # so we don't bet on it. The uuid name is collision-free; the name
        # is tracked on the INSTANCE (round-9 advice — a private attribute
        # on the frame is lost on any transformation) and released by
        # drop_changelog_views() once the caller is done with the frames.
        view = f"__iceberg_changes_{_uuid.uuid4().hex[:12]}"
        self.spark.sql(
            f"CALL {self.catalog}.system.create_changelog_view("
            f"table => '{self.identifier.split('.', 1)[1]}', "
            f"options => map({', '.join(opts)}), "
            f"changelog_view => '{view}')"
        )
        self._changelog_views.append(view)
        return self.spark.table(view)

    def drop_changelog_views(self) -> int:
        """Drop every changelog temp view this instance created (after
        the caller has fully consumed/persisted the change frames — a
        frame read from a dropped view cannot be re-analyzed). Returns
        the number of views dropped; idempotent. This bounds the
        session-global view namespace in long-lived sessions where
        changes() is called per cron tick."""
        dropped = 0
        while self._changelog_views:
            view = self._changelog_views.pop()
            try:
                self.spark.catalog.dropTempView(view)
                dropped += 1
            except Exception:
                pass  # already gone (session restart / external drop)
        return dropped


def snapshot_table(
    spark: SparkSession,
    path: str,
    format: str = "auto",
    identifier: str | None = None,
):
    """Environment-dispatched snapshot table: (table, backend) where
    backend ∈ {"delta", "occ", "iceberg"}. `format="auto"` prefers Delta
    when the runtime carries it (interop with the lakehouse's existing
    log) and falls back to the OCC table; an explicit `format="delta"` on
    a jar-less runtime raises the bootstrap recipe instead of silently
    degrading. `format="iceberg"` returns the catalog-SQL wrapper
    (IcebergSnapshotTable) when the runtime jar is present — Iceberg
    tables are catalog-addressed, so it additionally requires
    `identifier="catalog.db.table"` (`path` is ignored on that branch) —
    and raises its bootstrap when the jar is absent. An explicit iceberg
    request NEVER silently dispatches to another backend. Callers/tests
    assert the returned backend — dispatch is an environment fact, never
    a skipped test."""
    if format not in ("auto", "delta", "occ", "iceberg"):
        raise ValueError(f"unknown format {format!r}")
    if format == "iceberg":
        _require_iceberg(spark)
        if identifier is None:
            raise ValueError(
                "Iceberg tables are catalog-addressed: pass "
                "identifier='catalog.db.table' (the path argument only "
                "addresses the Delta/OCC backends)"
            )
        return IcebergSnapshotTable(spark, identifier), "iceberg"
    if format == "delta" or (format == "auto" and delta_available(spark)):
        return DeltaSnapshotTable(spark, path), "delta"
    from metrics_database_cron_script_spark.versioned import VersionedSnapshot

    return VersionedSnapshot(spark, path), "occ"
