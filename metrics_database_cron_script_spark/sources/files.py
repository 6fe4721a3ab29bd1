"""Schema-enforced CSV / JSON-lines file sources.

The reference's only inputs are schemaless BSON and REST JSON; the engine's
at-rest format is parquet (sources/tables.py). These readers extend the same
schema-on-read discipline to the two interchange formats a pipeline actually
receives from third parties. Principles:

- **Declared schema, never inference**: inference reads the data twice and
  yields drifting types across deliveries; every reader takes an explicit
  `StructType` (or a fixture table name, resolving to FIXTURES.md §B).
- **FAILFAST**: a malformed row aborts the read instead of becoming a silent
  null — the batch-ETL analog of the engine's ANSI-mode posture. Pass
  `permissive_corrupt_col` to switch to quarantine mode: malformed rows land
  in a `_corrupt_record` column for a dead-letter sink instead of killing
  the job (the 100 TB reality: a trillion-row delivery WILL contain a few
  bad rows, and re-running the whole batch per bad row is not an option).
- Text formats are a delivery/interchange surface, not a query surface —
  pipelines should land them to parquet (columnar, prunable, splittable)
  before repeated querying; CSV/JSON scans re-parse every byte per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from metrics_database_cron_script_spark.sources.tables import TABLES


def _resolve_schema(
    table: str | None,
    schema: T.StructType | None,
    corrupt_col: str | None,
) -> T.StructType:
    if schema is None:
        if table is None or table not in TABLES:
            raise ValueError(
                f"need an explicit schema or a known table name, got {table!r}"
            )
        schema = TABLES[table]
    # ALWAYS rebuild: StructType.add mutates in place and both the registry
    # entry and a caller-supplied schema are borrowed, not owned
    fields = list(schema.fields)
    if corrupt_col:
        fields.append(T.StructField(corrupt_col, T.StringType()))
    return T.StructType(fields)


def _mode_options(permissive_corrupt_col: str | None) -> dict[str, str]:
    if permissive_corrupt_col:
        return {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": permissive_corrupt_col}
    return {"mode": "FAILFAST"}


def read_csv(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    schema: T.StructType | None = None,
    header: bool = True,
    permissive_corrupt_col: str | None = None,
) -> DataFrame:
    """CSV with a declared schema; types come from the schema. With a
    header, `enforceSchema=false` makes Spark VALIDATE the header names
    against the schema and fail loudly on a reordered/renamed delivery —
    data binding is positional either way, so without the check a reordered
    file would silently land values in the wrong columns. Quoting/escaping
    are Spark defaults (RFC-4180-ish), which round-trips embedded
    commas/quotes in JSON-ish string columns."""
    resolved = _resolve_schema(table, schema, permissive_corrupt_col)
    reader = (
        spark.read.schema(resolved)
        .option("header", str(header).lower())
        .option("enforceSchema", "false" if header else "true")
        .options(**_mode_options(permissive_corrupt_col))
    )
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    schema: T.StructType | None = None,
    permissive_corrupt_col: str | None = None,
) -> DataFrame:
    """Newline-delimited JSON with a declared schema (one object per line —
    the splittable layout; multiline JSON arrays are NOT splittable and are
    deliberately unsupported here)."""
    resolved = _resolve_schema(table, schema, permissive_corrupt_col)
    reader = spark.read.schema(resolved).options(**_mode_options(permissive_corrupt_col))
    return reader.json(path)


def read_orc(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """ORC columnar source (Spark-native, vectorized, predicate-pushdown like
    parquet — the other at-rest format an existing lake may already hold).
    Self-describing like parquet, so the declared schema acts as a CONTRACT
    CHECK here rather than a parse spec: the file must carry every declared
    column WITH its declared type — a silent cast would coerce type drift
    (BIGINT delivered as DOUBLE truncates; strings nullify) instead of
    surfacing it, which is the opposite of a contract. No corrupt-record
    mode: binary columnar formats fail at the stripe level, not per-row."""
    resolved = _resolve_schema(table, schema, None)
    df = spark.read.orc(path)
    actual = {f.name: f.dataType for f in df.schema.fields}
    missing = [f.name for f in resolved.fields if f.name not in actual]
    if missing:
        raise ValueError(f"ORC source {path} lacks declared columns {missing}")
    drifted = [
        (f.name, str(actual[f.name]), str(f.dataType))
        for f in resolved.fields
        if actual[f.name] != f.dataType
    ]
    if drifted:
        raise ValueError(
            f"ORC source {path} type drift (column, found, declared): {drifted}"
        )
    return df.select(*[f.name for f in resolved.fields])


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink, layout-symmetric with the parquet writers (same partitionBy
    pruning story)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
