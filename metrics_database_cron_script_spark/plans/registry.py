"""Query contract registry (SURVEY.md §2.C).

Every operator the engine claims is registered here as a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB oracle
SQL string computing the same result over the same parquet files. The driver
runs both sides and compares row-count + schema + order-insensitive value
hash, so:

- every computed column is aliased identically on both sides;
- float aggregates are rounded identically on both sides (sums of 2-decimal
  money → round 2, which is exact because the true sum has 2 decimals and the
  accumulated fp error is far below 0.005; ratios/avgs/ln → round 6);
- orderings feeding window functions always carry a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Logical-plan cache: building a query through the DataFrame API costs
# 50–150 ms of driver-side py4j round-trips + analysis — pure fixed cost,
# identical on every call. A production job builds its plan once and
# executes it many times; the registry does the same per
# (application, query, sf_dir). Safe because query functions are pure plan
# constructors (no writes, no mutable captured state — enforced by the
# registry contract) and fixture dirs are immutable
# (sources/tables.load_table). `clear_plan_cache` exists for tools that
# break either assumption.
# Each entry stores (DataFrame, sizing-conf snapshot): Spark reads
# shuffle-partitions/AQE/scan-granularity at EXECUTION time, so a cache
# hit must re-apply the confs load_table calibrated when the plan was
# built — otherwise interleaving two sf_dirs in one session executes each
# dir's plan under the OTHER dir's sizing. Bounded FIFO so a long-lived
# multi-session process cannot grow it (each DataFrame pins its session).
_plan_cache: dict[tuple[str, int, str, str], tuple[DataFrame, dict]] = {}
_PLAN_CACHE_MAX = 512
_SIZING_CONFS = (
    "spark.sql.shuffle.partitions",
    "spark.sql.adaptive.enabled",
    "spark.sql.files.maxPartitionBytes",
)


def clear_plan_cache(sf_dir: str | None = None) -> None:
    """Drop cached plans — all of them, or only those built over `sf_dir`.
    Called by sources.tables.invalidate_caches so the two caches cannot
    drift: a plan embeds the same frozen file listing the catalog does."""
    if sf_dir is None:
        _plan_cache.clear()
        return
    root = sf_dir.rstrip("/")
    for k in [k for k in _plan_cache if k[3] == root]:
        del _plan_cache[k]


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` declares a rows-only check
    (float-heavy / sketch / non-SQL-expressible ops, listed in SURVEY.md §2.C)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name!r}")

        def cached(spark: SparkSession, sf_dir: str) -> DataFrame:
            # keyed on the SESSION (not just the app): two sessions of one
            # SparkContext differ in conf/temp views, and a DataFrame
            # executes under the session that built it
            key = (
                spark.sparkContext.applicationId,
                id(spark),
                name,
                sf_dir.rstrip("/"),
            )
            hit = _plan_cache.get(key)
            if hit is None:
                df = fn(spark, sf_dir)
                confs = {}
                for c in _SIZING_CONFS:
                    try:
                        confs[c] = spark.conf.get(c)
                    except Exception:
                        pass
                while len(_plan_cache) >= _PLAN_CACHE_MAX:
                    _plan_cache.pop(next(iter(_plan_cache)))
                _plan_cache[key] = (df, confs)
                return df
            df, confs = hit
            for c, v in confs.items():
                spark.conf.set(c, v)
            return df

        cached.__name__ = fn.__name__
        cached.__doc__ = fn.__doc__
        cached.__wrapped__ = fn
        QUERIES[name] = cached
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(ORACLES)
