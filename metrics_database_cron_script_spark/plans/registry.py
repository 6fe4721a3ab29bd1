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


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` declares a rows-only check
    (float-heavy / sketch / non-SQL-expressible ops, listed in SURVEY.md §2.C)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(ORACLES)
