"""Parquet table sources with declared schemas.

The reference reads schemaless BSON collections (``updatescript.py:59`` etc.);
here every table has a fixed, declared ``StructType`` (FIXTURES.md §B) so the
scan is columnar, prunable, and pushdown-friendly. ``load_table`` is the single
entry point every query/pipeline uses — filters applied on the returned
DataFrame reach the parquet reader (``PushedFilters``) because nothing here
materializes or caches eagerly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Declared fixture schemas (FIXTURES.md §B). Used for validation and for
# schema-on-read of streaming sources (readStream requires a schema).
TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            # parquet ms-timestamps carry isAdjustedToUTC=false → Spark 4
            # reads them as TIMESTAMP_NTZ (wall-clock, TZ-independent)
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            # naive wall-clock, same contract as o_orderdate/l_shipdate; the
            # fixture generation has shipped both TIMESTAMP(NANOS) (read as
            # long under the legacy conf) and TIMESTAMP(MICROS) (read as NTZ
            # directly) — load_table normalizes either to NTZ
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


# bytes of parquet per post-shuffle partition the sizing heuristic targets.
# 16 MB compressed ≈ 64 MB in-memory — the INITIAL width; where AQE is on
# (≥4 GiB gate below) its 64 MB advisory coalesces upward, which is the
# recommended posture (start fine, coalesce at runtime). Swept locally at
# the 170 MB synthetic sf1: 4-wide 1.63 s / 8-wide 1.22 s / 32-wide 1.57 s
# on the q21 shape — memory-bus contention beats parallelism past ~10
# local tasks, so the byte rule, not the core count, sets the width.
_SHUFFLE_TARGET_BYTES = 16 * 1024 * 1024
# dataset footprint below which AQE's per-stage re-planning round costs more
# than it can recover (nothing to coalesce/skew-split at MB scale)
_AQE_MIN_BYTES = 4 * 1024 * 1024 * 1024
_sized_dirs: dict[str, int] = {}


_dir_bytes_cache: dict[str, int] = {}


def _dir_bytes(sf_dir: str) -> int:
    import os

    root = sf_dir.rstrip("/")
    cached = _dir_bytes_cache.get(root)
    if cached is not None:
        return cached
    total = 0
    for name in TABLES:
        p = f"{root}/{name}.parquet"
        if os.path.isfile(p):
            total += os.path.getsize(p)
        elif os.path.isdir(p):
            for dirpath, _dirs, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
    _dir_bytes_cache[root] = total
    return total


def _size_shuffle(spark: SparkSession, sf_dir: str) -> None:
    """Scale-aware shuffle sizing: pick `spark.sql.shuffle.partitions` from the
    actual dataset footprint (~16 MB of compressed input per partition — the
    INITIAL width; AQE's 64 MB advisory coalesces upward where enabled), not
    Spark's static 200 default. At fixture scale that is single-digit
    partitions (per-task overhead dominates sub-MB partitions); at 100 TB the
    same rule yields hundreds of thousands, capped so AQE coalescing still
    owns the fine-grained sizing. Runs once per sf_dir; an explicit
    SPARK_GRAFT_SHUFFLE_PARTITIONS env pins the value instead."""
    import os

    key = sf_dir.rstrip("/")
    n = _sized_dirs.get(key)
    if n is None:
        env = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        if env:
            n = int(env)
        else:
            # floor 4, not cores: sub-MB shuffle partitions cost more in task
            # scheduling than they recover in parallelism (sweep at sf0.1:
            # 4 partitions ≈ 7.6-8.4 s headline, 8 ≈ 8.2-9.9, 32 ≈ 12.5);
            # the byte rule takes over as soon as data justifies more tasks
            n = max(4, min(_dir_bytes(key) // _SHUFFLE_TARGET_BYTES, 200_000))
        _sized_dirs[key] = n
    if spark.conf.get("spark.sql.shuffle.partitions", None) != str(n):
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
    # Scale-gated adaptivity: AQE re-optimizes after every shuffle stage —
    # pure win at cluster scale (skew splits, runtime join switches, partition
    # coalescing) but at sub-GB inputs there is nothing to adapt and the extra
    # per-stage planning round is measurable (12% on the sf0.1 headline set).
    # Below the threshold the static plan is strictly better; above it AQE
    # earns its keep. SPARK_GRAFT_AQE=on|off pins the choice.
    aqe_env = os.environ.get("SPARK_GRAFT_AQE", "")
    if aqe_env in ("on", "off"):
        aqe = aqe_env == "on"
    else:
        aqe = _dir_bytes(key) >= _AQE_MIN_BYTES
    if spark.conf.get("spark.sql.adaptive.enabled", None) != str(aqe).lower():
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    # Scale-aware SCAN granularity, the read-side twin of the shuffle rule:
    # Spark's static 128 MB maxPartitionBytes packs a small multi-file table
    # (sources/presplit.py layout; any real table's tail) into ONE scan task,
    # serializing the scan-stage CPU work (window partial prunes, explode,
    # hashing). Target ≈ bytes/cores so local scans use the machine; the
    # 128 MB cap restores the standard value as soon as data justifies it.
    # openCost scales down alongside, so sub-MB files still pack sensibly.
    mpb_env = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES")
    if mpb_env:
        mpb = int(mpb_env)
    else:
        cores = spark.sparkContext.defaultParallelism
        mpb = max(1 << 20, min(128 << 20, _dir_bytes(key) // max(cores, 1)))
    if spark.conf.get("spark.sql.files.maxPartitionBytes", None) != str(mpb):
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
        spark.conf.set("spark.sql.files.openCostInBytes", str(max(mpb // 8, 64 << 10)))


# Catalog cache: the analyzed DataFrame per (session, dir, table). Building
# one costs a driver-side file listing + parquet footer read per call — the
# metadata a real engine caches in its catalog (metastore / snapshot cache).
# Re-resolving it for every query measured ~40% of sf0.1 headline latency.
# The cached object is a LOGICAL plan: filters/projections applied by callers
# still push into the scan, and executions share nothing but metadata.
_table_cache: dict[tuple[str, str, str], DataFrame] = {}


def invalidate_caches(sf_dir: str | None = None) -> None:
    """Drop EVERY cache derived from `sf_dir` (or everything when None):
    the catalog's resolved DataFrames, directory byte sizes, shuffle/AQE
    sizing, and the registry's built query plans (plans/registry.py) — a
    cached query plan embeds the frozen file listing just like the catalog
    entry does, so purging one without the other would still serve stale
    reads for registered queries.

    `load_table` assumes fixture directories are IMMUTABLE for the life of
    the application — the parquet file listing is frozen at first load, so a
    tool that regenerates/overwrites a fixture dir in-process must call this
    first or later reads see stale files (FileNotFoundException or stale
    rows), and the byte-size-derived shuffle/AQE sizing stays frozen too."""
    from metrics_database_cron_script_spark.plans import registry
    from metrics_database_cron_script_spark.streaming import structured

    if sf_dir is None:
        _table_cache.clear()
        _dir_bytes_cache.clear()
        _sized_dirs.clear()
        _dim_rows_cache.clear()
        structured._stream_probe_cache.clear()
        registry.clear_plan_cache()
        return
    root = sf_dir.rstrip("/")
    for k in [k for k in _table_cache if k[1] == root]:
        del _table_cache[k]
    for k in [k for k in _dim_rows_cache if k[0].rstrip("/") == root]:
        del _dim_rows_cache[k]
    for k in [
        k
        for k in structured._stream_probe_cache
        # path is <sf_dir>/events.parquet — match the DIR, not a sibling
        # that happens to share the prefix (sf0.1 vs sf0.1-presplit)
        if k[1].startswith(root + "/")
    ]:
        del structured._stream_probe_cache[k]
    _dir_bytes_cache.pop(root, None)
    _sized_dirs.pop(root, None)
    registry.clear_plan_cache(root)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table (reference R1: `coll.find()`,
    updatescript.py:119 — but as a prunable parquet scan, not a cursor).

    Fixture dirs are assumed IMMUTABLE: the resolved plan (and its parquet
    file listing) is cached for the life of the application. Tools that
    rewrite a fixture dir in-process must call `invalidate_caches` first.

    Spark 4 rejects parquet TIMESTAMP(NANOS) columns (events.ts is ns); we
    read them as long via the legacy conf and convert to a µs timestamp in
    the plan — a cheap codegen'd projection, still fully pushdown-friendly
    for the non-timestamp predicates and prunable columns.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLES)}")
    _size_shuffle(spark, sf_dir)
    cache_key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"), name)
    cached = _table_cache.get(cache_key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Engine-wide determinism contract: all timestamps are naive wall-clock
    # interpreted as UTC (the fixtures were written TZ-naive). Pinning the
    # session TZ here makes day-bucketing (`to_date`) and timestamp literals
    # independent of whatever TZ the embedding session was created with.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    declared = TABLES[name]
    for field in declared.fields:
        if not isinstance(field.dataType, (T.TimestampType, T.TimestampNTZType)):
            continue
        actual = df.schema[field.name].dataType
        if isinstance(actual, T.LongType):
            # ns-precision fixture generation: raw ns longs → µs NTZ
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"{field.name} div 1000")).cast(
                    field.dataType
                ),
            )
        elif actual != field.dataType:
            # LTZ↔NTZ normalization — identity wall-clock under the pinned
            # UTC session timezone
            df = df.withColumn(field.name, F.col(field.name).cast(field.dataType))
    _table_cache[cache_key] = df
    return df


# Constant-cardinality dimensions: tables whose row count is fixed by the
# DATA MODEL, not the scale factor (TPC-H: nation = 25, region = 5 — the
# same 25/5 rows whether lineitem is 60 k rows or 100 TB). Only these may
# be inlined into a plan as literal lookup expressions.
CONSTANT_DIMS = frozenset({"nation", "region"})
_CONSTANT_DIM_MAX_ROWS = 1000
_dim_rows_cache: dict[tuple[str, str], list[dict]] = {}


def constant_dim_rows(sf_dir: str, name: str) -> list[dict]:
    """Driver-side rows of a CONSTANT-CARDINALITY dimension, for inlining
    the dim into a plan as a literal lookup (`F.create_map`/CASE) instead
    of a broadcast join.

    Why this is the right call at 100 TB, not a toy shortcut: a broadcast
    build of even a 25-row table is a Spark job (exchange build + collect)
    and a hashed-relation probe per fact row; a literal map is pure
    whole-stage-codegen — no job, no exchange, no relation to ship. The
    classic join-elimination for bounded dims. Guarded so it can never
    silently become a driver-side collect of a GROWING table: only tables
    in CONSTANT_DIMS are served, and the row count is asserted against the
    data-model bound."""
    if name not in CONSTANT_DIMS:
        raise ValueError(
            f"{name!r} is not a constant-cardinality dimension "
            f"({sorted(CONSTANT_DIMS)}): inlining a scale-growing table "
            "into the plan would collect unbounded rows to the driver"
        )
    key = (sf_dir.rstrip("/"), name)
    cached = _dim_rows_cache.get(key)
    if cached is None:
        import pyarrow.parquet as pq

        tbl = pq.read_table(table_path(sf_dir, name))
        if tbl.num_rows > _CONSTANT_DIM_MAX_ROWS:
            raise ValueError(
                f"{name} has {tbl.num_rows} rows — beyond the "
                f"constant-dim bound ({_CONSTANT_DIM_MAX_ROWS}); refusing "
                "to inline"
            )
        cached = tbl.to_pylist()
        _dim_rows_cache[key] = cached
    return cached


def inline_dim_map(sf_dir: str, name: str, key: str, value) -> "F.Column":
    """A literal MAP column `key → value` of a constant dimension, built at
    plan time from `constant_dim_rows`. `value` is either a column name or
    a callable row→literal for composed lookups (e.g. nation joined to
    region on the driver). Inner-join semantics are reproduced by the
    caller filtering `element_at(map, k) IS NOT NULL` (element_at yields
    NULL on a missing key)."""
    rows = constant_dim_rows(sf_dir, name)
    args = []
    for r in rows:
        args.append(F.lit(r[key]))
        args.append(F.lit(value(r) if callable(value) else r[value]))
    return F.create_map(*args)


def events_since(spark: SparkSession, sf_dir: str, watermark: str) -> DataFrame:
    """Watermark scan of `events` with the predicate pushed to the parquet
    reader (reference R2, updatescript.py:59).

    The ns→timestamp conversion in `load_table` is a projection, so a filter
    on the converted column cannot prune row groups. Here the strict-greater
    comparison is applied in raw ns-long space BEFORE the conversion —
    Catalyst pushes `ts > <ns literal>` into the scan (`PushedFilters`),
    enabling min/max row-group pruning, which at 100 TB is the difference
    between scanning a day and scanning years."""
    import datetime

    _size_shuffle(spark, sf_dir)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wm = datetime.datetime.fromisoformat(watermark)
    if wm.tzinfo is not None:
        # tz-aware ISO watermark ('...+00:00'): normalize to naive UTC so
        # the integer-micros arithmetic below (aware − naive would raise
        # TypeError) and the naive-timestamp fixture column agree
        wm = wm.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    raw = spark.read.parquet(table_path(sf_dir, "events"))
    if isinstance(raw.schema["ts"].dataType, T.LongType):
        # ns-long layout: compare in raw ns space so the strict-greater
        # predicate reaches the scan before the µs conversion projection
        # exact integer micros: float .timestamp() carries ~0.4 µs error
        # near current epochs, enough to truncate a µs-precision watermark
        # one tick low and re-include the boundary row every run
        epoch = datetime.datetime(1970, 1, 1)
        ns = (wm - epoch) // datetime.timedelta(microseconds=1) * 1000
        raw = raw.filter(F.col("ts") > ns)
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    # native timestamp layout: the typed comparison itself is pushed down
    # (parquet min/max stats on timestamp columns prune row groups directly)
    return raw.filter(
        F.col("ts") > F.lit(wm).cast(raw.schema["ts"].dataType)
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def register_views(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Expose the catalog to plain `spark.sql(...)`: every fixture table
    becomes a temp view (optionally `prefix`ed) backed by the same cached,
    schema-normalized logical plan as `load_table` — so SQL queries get the
    identical pushdown/pruning behavior as the DataFrame API, and the two
    surfaces can be mixed freely in one session. Mirrors how the DuckDB
    oracle registers the same parquet files as views (oracle.py).

    Returns the registered view names.
    """
    names = []
    for name in TABLES:
        view = f"{prefix}{name}"
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
        names.append(view)
    return names
