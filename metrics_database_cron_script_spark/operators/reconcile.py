"""Keyed table reconciliation: what changed between two relations.

The migration/backfill audit every pipeline cutover needs (data-diff):
given two keyed relations, classify every key as added / removed /
changed / unchanged in ONE full-outer shuffle join on the key. Row
content is compared via a `to_json(struct(compare_cols))` fingerprint
computed in the scan projection — collision-free (it IS the row content,
canonically serialized), null-safe, and one string per row through the
shuffle instead of every column. At 100 TB both sides shuffle once on
the key; with both tables bucketed/clustered on the key the exchange
drops out entirely (sources/tables bucketing, operators/layout).

A production variant can swap the JSON fingerprint for `xxhash64` of the
same struct — 8 bytes through the shuffle instead of the serialized row,
at the cost of a ~2^-64 per-pair collision accepting a false
'unchanged'. This module keeps the exact form so the operator's result
is value-checkable against plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key diff of `b` (new) against `a` (old): (key, status) with
    status ∈ {'added','removed','changed','unchanged'}. `compare_cols`
    defaults to every shared non-key column."""
    if compare_cols is None:
        compare_cols = [
            c for c in a.columns if c != key and c in set(b.columns)
        ]
    if not compare_cols:
        raise ValueError("table_diff needs at least one compare column")

    def fingered(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(key),
            F.to_json(F.struct(*compare_cols)).alias(f"__fp_{side}"),
        )

    joined = fingered(a, "a").join(fingered(b, "b"), key, "full_outer")
    status = (
        F.when(F.col("__fp_b").isNull(), F.lit("removed"))
        .when(F.col("__fp_a").isNull(), F.lit("added"))
        .when(F.col("__fp_a") != F.col("__fp_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(F.col(key), status.alias("status"))


def table_diff_summary(
    a: DataFrame,
    b: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Aggregate readout: (status, n) counts — the four-line answer to
    'did the backfill change anything it shouldn't have'."""
    return (
        table_diff(a, b, key, compare_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
