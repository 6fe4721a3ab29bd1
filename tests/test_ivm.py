"""Incremental view maintenance (operators/ivm.py) folded over the
versioned table's change feed: after every commit the incrementally
maintained SUM/COUNT view must EQUAL the full recompute of that version —
including group moves (update shifts a row between groups) and groups
emptying out (dropped, not left at zero)."""

from __future__ import annotations

import datetime as dt
import random

from metrics_database_cron_script_spark.operators.ivm import (
    incremental_group_agg,
    recompute_group_agg,
)
from metrics_database_cron_script_spark.versioned import VersionedSnapshot

SCHEMA = "k bigint, grp string, val bigint, ts timestamp"


def _rows(df):
    # None sorts before everything (null group keys are legal)
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is not None, v) for v in t),
    )


def test_ivm_tracks_recompute_across_merges(spark, tmp_path):
    t = VersionedSnapshot(spark, str(tmp_path / "snap"))
    rng = random.Random(11)
    groups = ["a", "b", "c"]

    def batch(n_keys, day):
        return spark.createDataFrame(
            [
                (k, rng.choice(groups), rng.randrange(100), dt.datetime(2024, 1, day))
                for k in rng.sample(range(40), n_keys)
            ],
            SCHEMA,
        )

    t.overwrite(batch(30, 1))
    mv = recompute_group_agg(t.read(), keys=["grp"], sum_cols=["val"])

    for day in (2, 3, 4, 5):
        v_prev = t.version()
        t.merge_keep_latest(batch(20, day), key="k", order_cols=["ts"])
        feed = t.changes(v_prev, keys=["k"])
        mv = incremental_group_agg(mv, feed, keys=["grp"], sum_cols=["val"])
        expect = recompute_group_agg(t.read(), keys=["grp"], sum_cols=["val"])
        assert _rows(mv) == _rows(expect)


def test_ivm_drops_emptied_groups_and_handles_group_moves(spark, tmp_path):
    t = VersionedSnapshot(spark, str(tmp_path / "snap"))
    d = dt.datetime(2024, 1, 1)
    t.overwrite(
        spark.createDataFrame([(1, "a", 10, d), (2, "b", 20, d)], SCHEMA)
    )
    mv = recompute_group_agg(t.read(), keys=["grp"], sum_cols=["val"])

    # key 1 MOVES a→b; key 2 value changes in place
    d2 = dt.datetime(2024, 1, 2)
    t.merge_keep_latest(
        spark.createDataFrame([(1, "b", 11, d2), (2, "b", 25, d2)], SCHEMA),
        key="k",
        order_cols=["ts"],
    )
    mv = incremental_group_agg(
        mv, t.changes(0, keys=["k"]), keys=["grp"], sum_cols=["val"]
    )
    got = _rows(mv)
    assert got == [("b", 36, 2, 2)]  # group 'a' emptied → dropped, not zeroed
    # (schema: grp, sum_val, nn_val, n_rows — nn_val is the NULL-sum counter)


def test_ivm_null_group_keys_and_all_null_sums(spark, tmp_path):
    """Regression: NULL group keys must merge null-safely (groupBy treats
    NULL as a group), and a group whose remaining values are all NULL must
    report sum NULL like the recompute — not 0."""
    t = VersionedSnapshot(spark, str(tmp_path / "snap"))
    d = dt.datetime(2024, 1, 1)
    t.overwrite(
        spark.createDataFrame(
            [(1, None, 10, d), (2, None, None, d), (3, "a", None, d)], SCHEMA
        )
    )
    mv = recompute_group_agg(t.read(), keys=["grp"], sum_cols=["val"])

    # delete key 1 (the only non-null val in the NULL group) by moving it
    # out; group 'a' stays all-NULL throughout
    d2 = dt.datetime(2024, 1, 2)
    t.merge_keep_latest(
        spark.createDataFrame([(1, "a", 7, d2)], SCHEMA),
        key="k",
        order_cols=["ts"],
    )
    mv = incremental_group_agg(
        mv, t.changes(0, keys=["k"]), keys=["grp"], sum_cols=["val"]
    )
    expect = recompute_group_agg(t.read(), keys=["grp"], sum_cols=["val"])
    assert _rows(mv) == _rows(expect)
    # explicit shape: NULL group keeps only its all-NULL row -> sum NULL
    null_grp = [tuple(r) for r in mv.filter("grp IS NULL").collect()]
    assert null_grp == [(None, None, 0, 1)]
