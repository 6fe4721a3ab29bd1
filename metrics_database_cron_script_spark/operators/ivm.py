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
    (in tests) as the oracle the incremental path must equal. Each sum
    column carries a non-null counter `nn_<col>` in the MV state: SQL's
    SUM over an all-NULL group is NULL, and after deletes the only way
    the incremental path can distinguish 'sums to 0' from 'no non-null
    values left' is to maintain that counter alongside."""
    return base.groupBy(*keys).agg(
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        *[F.count(c).alias(f"nn_{c}") for c in sum_cols],
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
    touches few groups — no hint pinned, stats decide).

    The join is NULL-SAFE on every key (`groupBy` treats NULL as a group,
    so the merge must too — a plain equi-join would leave a NULL-keyed MV
    row and its delta forever unmerged), and each merged sum goes back to
    NULL when its maintained non-null counter hits zero, matching SQL SUM
    over an all-NULL group in the recompute."""
    sign = F.when(
        F.col(change_col).isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = feed.groupBy(*keys).agg(
        *[F.sum(sign * F.col(c)).alias(f"sum_{c}") for c in sum_cols],
        *[
            F.sum(F.when(F.col(c).isNotNull(), sign).otherwise(0)).alias(
                f"nn_{c}"
            )
            for c in sum_cols
        ],
        F.sum(sign).alias(count_col),
    )
    m, d = mv.alias("m"), delta.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"m.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else cond & c
    j = m.join(d, on=cond, how="full_outer")
    merged_keys = [
        F.coalesce(F.col(f"m.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]

    def _plus(col: str):
        return F.coalesce(F.col(f"m.{col}"), F.lit(0)) + F.coalesce(
            F.col(f"d.{col}"), F.lit(0)
        )

    merged_sums = [
        F.when(_plus(f"nn_{c}") > 0, _plus(f"sum_{c}")).alias(f"sum_{c}")
        for c in sum_cols
    ]
    merged_nns = [_plus(f"nn_{c}").alias(f"nn_{c}") for c in sum_cols]
    merged_n = _plus(count_col).alias(count_col)
    return j.select(*merged_keys, *merged_sums, *merged_nns, merged_n).filter(
        F.col(count_col) > 0
    )
