"""Table reconciliation (operators/reconcile.py): per-key statuses, null
safety of the fingerprint, and the summary rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metrics_database_cron_script_spark.operators.reconcile import (
    table_diff,
    table_diff_summary,
)


def _frames(spark):
    a = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", None), (3, None, 3.0), (4, "w", 4.0)],
        "k int, s string, v double",
    )
    b = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, None, 3.0), (5, "new", 5.0)],
        "k int, s string, v double",
    )
    return a, b


def test_statuses_per_key(spark):
    a, b = _frames(spark)
    got = {r["k"]: r["status"] for r in table_diff(a, b, "k").collect()}
    assert got == {
        1: "unchanged",
        2: "changed",  # NULL -> 2.0 is a change, not a fingerprint blind spot
        3: "unchanged",  # identical including the NULL column
        4: "removed",
        5: "added",
    }


def test_summary_matches_detail(spark):
    a, b = _frames(spark)
    s = {r["status"]: r["n"] for r in table_diff_summary(a, b, "k").collect()}
    assert s == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}


def test_compare_cols_subset(spark):
    a, b = _frames(spark)
    # comparing only `s` hides the v-column change on key 2
    got = {r["k"]: r["status"] for r in table_diff(a, b, "k", ["s"]).collect()}
    assert got[2] == "unchanged"


def test_no_shared_columns_rejected(spark):
    a = spark.createDataFrame([(1, "x")], "k int, s string")
    b = spark.createDataFrame([(1, 2.0)], "k int, v double")
    with pytest.raises(ValueError):
        table_diff(a, b, "k")
