"""Negative controls: the oracle harness must actually FAIL on wrong
results — guards against a vacuous comparison (e.g., normalization that
collapses everything to equal)."""

from __future__ import annotations

import pandas as pd

from metrics_database_cron_script_spark.oracle import compare


def test_compare_flags_value_mismatch(spark):
    sdf = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    wrong = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.5]})
    res = compare(sdf, wrong)
    assert not res["ok"] and res["rows_match"] and res["cols_match"]


def test_compare_flags_row_count_mismatch(spark):
    sdf = spark.createDataFrame([(1, 10.0)], "k long, v double")
    wrong = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]})
    assert not compare(sdf, wrong)["ok"]


def test_compare_flags_schema_mismatch(spark):
    sdf = spark.createDataFrame([(1, 10.0)], "k long, v double")
    wrong = pd.DataFrame({"k": [1], "other": [10.0]})
    assert not compare(sdf, wrong)["ok"]


def test_compare_accepts_reordered_rows_and_columns(spark):
    sdf = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    ok = pd.DataFrame({"v": [20.0, 10.0], "k": [2, 1]})  # shuffled both ways
    assert compare(sdf, ok)["ok"]


def test_compare_distinguishes_null_from_zero(spark):
    sdf = spark.createDataFrame([(1, None)], "k long, v double")
    wrong = pd.DataFrame({"k": [1], "v": [0.0]})
    assert not compare(sdf, wrong)["ok"]
    right = pd.DataFrame({"k": [1], "v": [float("nan")]})
    assert compare(sdf, right)["ok"]  # NaN ≡ SQL NULL through pandas


def test_oracle_gate_rejects_spark_nan(spark):
    """Regression: NaN canonicalizes with NULL (the oracle's pandas
    surface can't tell them apart), so the gate must reject NaN on the
    Spark side — where the distinction IS visible — instead of letting a
    NaN-vs-NULL divergence pass as a value match."""
    import pandas as pd

    from metrics_database_cron_script_spark.oracle import compare

    nan_df = spark.sql("SELECT 1 AS k, double('NaN') AS v")
    oracle_null = pd.DataFrame({"k": [1], "v": [None]})
    r = compare(nan_df, oracle_null)
    assert r["spark_nan_cells"] == 1
    assert not r["ok"]

    null_df = spark.sql("SELECT 1 AS k, CAST(NULL AS DOUBLE) AS v")
    r2 = compare(null_df, oracle_null)
    assert r2["spark_nan_cells"] == 0
    assert r2["ok"]
