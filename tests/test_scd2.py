"""SCD Type-2 merge semantics (operators/scd2.py scd2_apply).

The four merge cases — carried, no-op change, real change (close + open),
brand-new key — plus chaining (two batches compose to the same history one
combined pass-per-day would give) and history pass-through."""

from __future__ import annotations

import datetime as dt

import pytest

DIM_SCHEMA = (
    "k bigint, state string, extra string, "
    "valid_from timestamp, valid_to timestamp, is_current boolean"
)
CHG_SCHEMA = "k bigint, state string, extra string, eff_ts timestamp"

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 1, 10)
T2 = dt.datetime(2024, 1, 20)


def _apply(spark, dim_rows, chg_rows):
    from metrics_database_cron_script_spark.operators.scd2 import scd2_apply

    dim = spark.createDataFrame(dim_rows, DIM_SCHEMA)
    chg = spark.createDataFrame(chg_rows, CHG_SCHEMA)
    return scd2_apply(dim, chg, keys=["k"], attrs=["state", "extra"])


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_all_four_merge_cases(spark):
    dim = [
        # k=1: history row + current row, gets a REAL change
        (1, "a", "x", T0, T1, False),
        (1, "b", "x", T1, None, True),
        # k=2: current only, NO change in the batch
        (2, "a", "y", T0, None, True),
        # k=3: current only, NO-OP change (same attrs)
        (3, "c", "z", T0, None, True),
    ]
    chg = [
        (1, "c", "x", T2),
        (3, "c", "z", T2),
        (4, "d", "w", T2),  # brand-new key
    ]
    out = _rows(_apply(spark, dim, chg))
    assert out == {
        (1, "a", "x", T0, T1, False),   # history untouched
        (1, "b", "x", T1, T2, False),   # closed out at eff_ts
        (1, "c", "x", T2, None, True),  # opened with new attrs
        (2, "a", "y", T0, None, True),  # carried
        (3, "c", "z", T0, None, True),  # no-op change leaves row open
        (4, "d", "w", T2, None, True),  # new key inserted
    }


def test_change_in_any_attr_closes_the_row(spark):
    # a change in the SECOND attribute alone must close + open
    dim = [(1, "a", "x", T0, None, True)]
    chg = [(1, "a", "y", T1)]
    out = _rows(_apply(spark, dim, chg))
    assert out == {
        (1, "a", "x", T0, T1, False),
        (1, "a", "y", T1, None, True),
    }


def test_null_attr_transitions_are_null_safe(spark):
    # NULL→value and value→NULL are real changes; NULL→NULL is a no-op
    dim = [
        (1, None, "x", T0, None, True),
        (2, "a", None, T0, None, True),
        (3, None, None, T0, None, True),
    ]
    chg = [(1, "a", "x", T1), (2, "a", None, T1), (3, None, None, T1)]
    out = _rows(_apply(spark, dim, chg))
    assert out == {
        (1, None, "x", T0, T1, False),
        (1, "a", "x", T1, None, True),
        (2, "a", None, T0, None, True),  # no-op
        (3, None, None, T0, None, True),  # NULL == NULL under eqNullSafe
    }


def test_two_batches_chain(spark):
    dim = [(1, "a", "x", T0, None, True)]
    chg1 = [(1, "b", "x", T1)]
    chg2 = [(1, "c", "x", T2)]
    from metrics_database_cron_script_spark.operators.scd2 import scd2_apply

    d0 = spark.createDataFrame(dim, DIM_SCHEMA)
    d1 = scd2_apply(
        d0,
        spark.createDataFrame(chg1, CHG_SCHEMA),
        keys=["k"],
        attrs=["state", "extra"],
    )
    d2 = scd2_apply(
        d1,
        spark.createDataFrame(chg2, CHG_SCHEMA),
        keys=["k"],
        attrs=["state", "extra"],
    )
    assert _rows(d2) == {
        (1, "a", "x", T0, T1, False),
        (1, "b", "x", T1, T2, False),
        (1, "c", "x", T2, None, True),
    }


def test_empty_change_batch_is_identity(spark):
    dim = [
        (1, "a", "x", T0, T1, False),
        (1, "b", "x", T1, None, True),
    ]
    out = _rows(_apply(spark, dim, []))
    assert out == set(tuple(r) for r in dim)


def test_schema_is_stable(spark):
    out = _apply(spark, [(1, "a", "x", T0, None, True)], [(2, "b", "y", T1)])
    assert out.columns == [
        "k", "state", "extra", "valid_from", "valid_to", "is_current"
    ]
    assert dict(out.dtypes)["valid_to"] == "timestamp"


@pytest.mark.parametrize("n_keys", [200])
def test_intervals_tile_after_random_batches(spark, n_keys):
    """Property over a generated workload: after three sequential batches,
    per-key intervals tile (each close = next open), exactly one current
    row per live key, and no interval ordering violations."""
    import random

    rng = random.Random(7)
    states = ["a", "b", "c"]
    dim = [
        (k, rng.choice(states), "e", T0, None, True) for k in range(n_keys)
    ]
    from metrics_database_cron_script_spark.operators.scd2 import scd2_apply

    snap = spark.createDataFrame(dim, DIM_SCHEMA)
    for day in (10, 20, 25):
        eff = dt.datetime(2024, 1, day)
        batch = [
            (k, rng.choice(states), "e", eff)
            for k in range(n_keys)
            if rng.random() < 0.5
        ]
        snap = scd2_apply(
            snap,
            spark.createDataFrame(batch, CHG_SCHEMA),
            keys=["k"],
            attrs=["state", "extra"],
        )
    rows = snap.collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    for k, rs in by_key.items():
        rs.sort(key=lambda r: r["valid_from"])
        currents = [r for r in rs if r["is_current"]]
        assert len(currents) == 1 and currents[0] is rs[-1]
        assert rs[-1]["valid_to"] is None
        for prev, nxt in zip(rs, rs[1:]):
            assert prev["valid_to"] == nxt["valid_from"]  # tiling
            assert not prev["is_current"]
