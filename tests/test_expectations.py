"""Expectations operator (operators/expectations.py): routing is a clean
partition of the input, per-rule metrics ride the caller's action with no
extra jobs, and NULL rule results do not quarantine (SQL constraint
semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metrics_database_cron_script_spark.operators.expectations import validate

from tests.conftest import SF_CORRECT


def _events(spark):
    from metrics_database_cron_script_spark.sources import load_table

    return load_table(spark, SF_CORRECT, "events")


def _rules():
    # built lazily: Column construction needs an active SparkContext
    return {
        "value_min": F.col("value") >= 0.5,
        "no_error_type": F.col("event_type") != "error",
    }


def test_routing_partitions_input(spark):
    ev = _events(spark)
    v = validate(ev, _rules())
    n_good, n_quar, n_all = v.good.count(), v.quarantined.count(), ev.count()
    assert n_good + n_quar == n_all
    assert v.good.schema == ev.schema  # good side passes through untouched
    # quarantine carries the violated-rule names
    assert "violated" in v.quarantined.columns
    assert v.quarantined.filter(F.size("violated") == 0).count() == 0


def test_metrics_ride_existing_action(spark):
    ev = _events(spark)
    v = validate(ev, _rules())
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    n_quar = v.quarantined.count()  # the caller's OWN action
    metrics = v.metrics()  # must not spawn any further job
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after - before == 1, "metrics() ran extra jobs"
    assert metrics["rows"] == ev.count()
    assert metrics["value_min"] == ev.filter(F.col("value") < 0.5).count()
    assert metrics["no_error_type"] == ev.filter(
        F.col("event_type") == "error"
    ).count()
    # counts are per-rule diagnostics; quarantine rows are the distinct union
    assert n_quar <= metrics["value_min"] + metrics["no_error_type"]


def test_null_rule_result_does_not_quarantine(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -1.0)], "id int, v double"
    )
    v = validate(df, {"nonneg": F.col("v") >= 0})
    quarantined = [r["id"] for r in v.quarantined.collect()]
    assert quarantined == [3]  # NULL (unknown) passes, FALSE quarantines
    strict = validate(
        df, {"nonneg": F.coalesce(F.col("v") >= 0, F.lit(False))}
    )
    assert sorted(r["id"] for r in strict.quarantined.collect()) == [2, 3]


def test_empty_rules_rejected(spark):
    with pytest.raises(ValueError):
        validate(_events(spark), {})


def test_reserved_rows_rule_name_rejected(spark):
    with pytest.raises(ValueError, match="reserved"):
        validate(_events(spark), {"rows": F.col("value") >= 0})
