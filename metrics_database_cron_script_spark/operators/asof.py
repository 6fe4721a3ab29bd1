"""As-of join (point-in-time lookup) — an operator Spark lacks natively.

Natural extension of the reference's R13 price lookup ("price as of tx
time", updatescript.py:64-67) to sparse dimensions. Strategy here is the
interval-broadcast form: turn the sorted dimension into half-open validity
intervals ``[date, next_date)`` with a single ``lead`` pass, broadcast it, and
range-join probes so each probe row lands in exactly one interval — no
post-join dedup window needed.

Scale notes: the global ``lead`` window over the dim is fine while the dim is
broadcast-sized (a daily price dim at 100 TB of *facts* is still only
thousands of rows). For large dims, partition both sides by the equi-key and
use ``applyInPandas`` + ``pd.merge_asof`` per key group, or bucketize the
range key and equi-join on the bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_broadcast_dim(
    probe: DataFrame,
    dim: DataFrame,
    probe_key: str,
    dim_key: str,
    how: str = "left",
    tolerance_days: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Join each probe row to the dim row with the greatest ``dim_key`` ≤
    ``probe_key``. ``dim`` must be broadcast-sized and have unique keys.

    ``tolerance_days`` bounds the staleness (pandas ``merge_asof``
    tolerance): a probe only matches when the dim row is at most that many
    days away; probes beyond tolerance fall through to NULL under
    ``how='left'``.

    ``direction='backward'`` (default) matches the greatest dim_key ≤
    probe_key; ``'forward'`` matches the least dim_key ≥ probe_key (the
    next-scheduled-event lookup). Either way each probe lands in exactly
    one half-open validity interval — no post-join dedup."""
    if direction == "backward":
        nxt = F.lead(dim_key).over(Window.orderBy(dim_key))
        intervals = dim.withColumn("__asof_end", nxt)
        cond = (probe[probe_key] >= intervals[dim_key]) & (
            intervals["__asof_end"].isNull()
            | (probe[probe_key] < intervals["__asof_end"])
        )
        if tolerance_days is not None:
            cond = cond & (
                F.datediff(probe[probe_key], intervals[dim_key]) <= tolerance_days
            )
    elif direction == "forward":
        prv = F.lag(dim_key).over(Window.orderBy(dim_key))
        intervals = dim.withColumn("__asof_start", prv)
        cond = (probe[probe_key] <= intervals[dim_key]) & (
            intervals["__asof_start"].isNull()
            | (probe[probe_key] > intervals["__asof_start"])
        )
        if tolerance_days is not None:
            cond = cond & (
                F.datediff(intervals[dim_key], probe[probe_key]) <= tolerance_days
            )
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    return probe.join(F.broadcast(intervals), cond, how).drop(
        "__asof_end", "__asof_start"
    )


def asof_join_grouped(
    probe: DataFrame,
    dim: DataFrame,
    by: str,
    probe_key: str,
    dim_key: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """As-of join for NON-broadcast-sized dims: both sides are co-grouped on
    the equi-key `by` (one shuffle each) and each key group runs
    ``pd.merge_asof`` in an Arrow batch — the per-key sorted-merge that a
    native as-of operator would do, parallel across keys. Use when the dim
    is too big to broadcast (e.g. per-entity price histories); the
    broadcast-interval form stays the right choice for small dims.

    Backward direction, left semantics: every probe row survives, dim
    value columns are NULL before the first dim key. `value_cols` defaults
    to all dim columns except `by`/`dim_key`.
    """
    import pandas as pd

    if value_cols is None:
        value_cols = [c for c in dim.columns if c not in (by, dim_key)]
    overlap = set(value_cols) & set(probe.columns)
    if overlap:
        raise ValueError(
            "value_cols collide with probe columns (pd.merge_asof would "
            f"suffix them away): {sorted(overlap)} — rename on the dim side"
        )
    probe_schema = probe.schema
    out_fields = list(probe_schema.fields) + [dim.schema[c] for c in value_cols]
    from pyspark.sql import types as T

    out_schema = T.StructType(out_fields)
    probe_cols = list(probe.columns)

    def _sortable(s: pd.Series) -> pd.Series:
        # merge_asof needs numeric/datetime64 keys; date columns arrive as
        # object dtype through Arrow → normalize
        if s.dtype == object:
            return pd.to_datetime(s)
        return s

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=probe_cols + value_cols)
        # NULL keys: merge_asof requires sorted non-null keys, and NaN/NaT
        # sort last → ValueError. Route NULL-keyed probe rows around the
        # merge (they survive with NULL values — left-join semantics, same
        # as the broadcast variant) and drop NULL-keyed dim rows (a NULL
        # dim key can never be the as-of match).
        lk = left.assign(__asof_k=_sortable(left[probe_key]))
        null_rows = lk[lk["__asof_k"].isna()]
        lk = lk[lk["__asof_k"].notna()]
        if right.empty:
            rk = pd.DataFrame(columns=["__asof_k"] + value_cols)
        else:
            rk = right[[dim_key] + value_cols].assign(
                __asof_k=_sortable(right[dim_key])
            )[["__asof_k"] + value_cols]
            rk = rk[rk["__asof_k"].notna()]
        if lk.empty:
            merged = pd.DataFrame(columns=probe_cols + value_cols)
        elif rk.empty:
            merged = lk.copy()
            for c in value_cols:
                merged[c] = None
            merged = merged[probe_cols + value_cols]
        else:
            merged = pd.merge_asof(
                lk.sort_values("__asof_k", kind="mergesort"),
                rk.sort_values("__asof_k", kind="mergesort"),
                on="__asof_k",
                direction="backward",
            )[probe_cols + value_cols]
        if not null_rows.empty:
            pad = null_rows.copy()
            for c in value_cols:
                pad[c] = None
            merged = pd.concat(
                [merged, pad[probe_cols + value_cols]], ignore_index=True
            )
        return merged

    return (
        probe.groupBy(by)
        .cogroup(dim.groupBy(by))
        .applyInPandas(merge, schema=out_schema)
    )
