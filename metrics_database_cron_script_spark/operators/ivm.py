"""Incremental view maintenance: apply a change feed to a SUM/COUNT
group-by materialized view without rescanning the base table.

Composes with `VersionedSnapshot.changes` (the CDF): each commit's feed is
delta-sized, so maintaining an aggregate view costs O(delta) instead of the
O(table) recompute — the same upgrade `merge_keep_latest_partitioned` gives
storage. The algebra is the classic signed-delta form: `insert` /
`update_postimage` rows contribute +1, `delete` / `update_preimage` rows
contribute −1; an update that MOVES a row between groups subtracts from the
old group (preimage) and adds to the new one (postimage) with no special
casing. Groups whose maintained row count reaches zero are dropped, so the
view stays exactly the set of non-empty groups a recompute would produce.

SUM / COUNT (and AVG = sum/count at read time) are self-maintainable under
deletes; MIN/MAX are NOT (a deleted extremum needs a rescan of its group) —
keep those in sketch or recompute form. Float sums incrementally applied
accumulate in a different order than a recompute — exact for integral
values and for DecimalType; for float money at 100 TB use the decimal mode
(SURVEY §7), same rule as everywhere else in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recompute_group_agg(
    base: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """The view definition: full recompute — used to bootstrap the MV and
    (in tests) as the oracle the incremental path must equal."""
    return base.groupBy(*keys).agg(
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias(count_col),
    )


def incremental_group_agg(
    mv: DataFrame,
    feed: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
    change_col: str = "_change_type",
) -> DataFrame:
    """Fold one change feed into the view: one delta-sized aggregation +
    one full-outer join on the group keys (broadcast-able when the delta
    touches few groups — no hint pinned, stats decide)."""
    sign = F.when(
        F.col(change_col).isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = feed.groupBy(*keys).agg(
        *[F.sum(sign * F.col(c)).alias(f"sum_{c}") for c in sum_cols],
        F.sum(sign).alias(count_col),
    )
    m, d = mv.alias("m"), delta.alias("d")
    j = m.join(d, on=list(keys), how="full_outer")
    merged_sums = [
        (
            F.coalesce(F.col(f"m.sum_{c}"), F.lit(0))
            + F.coalesce(F.col(f"d.sum_{c}"), F.lit(0))
        ).alias(f"sum_{c}")
        for c in sum_cols
    ]
    merged_n = (
        F.coalesce(F.col(f"m.{count_col}"), F.lit(0))
        + F.coalesce(F.col(f"d.{count_col}"), F.lit(0))
    ).alias(count_col)
    return j.select(*keys, *merged_sums, merged_n).filter(
        F.col(count_col) > 0
    )
