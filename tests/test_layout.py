"""Data-layout governance (operators/layout.py): clustered and Z-ordered
writes must produce parquet footer stats that a pruning reader can skip
on — asserted from the same min/max envelopes engines consult."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metrics_database_cron_script_spark.operators.layout import (
    clustered_write,
    file_envelopes,
    pruning_fraction,
    zorder_value,
)
from tests.conftest import SF_SMOKE


def _events(spark):
    from metrics_database_cron_script_spark.sources import load_table

    return load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value"
    )


def _checksum(spark, path_or_df):
    df = (
        spark.read.parquet(path_or_df)
        if isinstance(path_or_df, str)
        else path_or_df
    )
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").alias("se"),
        F.round(F.sum("value"), 4).alias("sv"),
    ).collect()[0]
    return (r["n"], r["se"], r["sv"])


def test_clustered_write_narrows_envelopes_and_prunes(spark, tmp_path):
    """Linear clustering on `value`: file envelopes become near-disjoint
    along value, so a narrow range predicate can skip most files — while
    the arrival-order layout can skip none. Rows survive exactly."""
    ev = _events(spark)
    lo, hi = ev.approxQuantile("value", [0.40, 0.45], 0.0)

    raw = str(tmp_path / "raw")
    ev.write.parquet(raw)  # arrival order: every file spans the domain
    clustered = str(tmp_path / "clustered")
    clustered_write(ev, clustered, ["value"], n_files=16)

    assert _checksum(spark, clustered) == _checksum(spark, ev)
    assert pruning_fraction(raw, "value", lo, hi) == 0.0
    assert pruning_fraction(clustered, "value", lo, hi) >= 0.75


def test_zorder_bounds_every_clustered_dimension(spark, tmp_path):
    """Z-order on (value, user_id): BOTH columns get bounded envelopes, so
    predicates on either prune — the linear value-sort prunes nothing on
    user_id. This is the multi-dimensional trade Z-ordering exists for."""
    ev = _events(spark)
    v_lo, v_hi = ev.approxQuantile("value", [0.40, 0.45], 0.0)
    u_lo, u_hi = ev.approxQuantile(
        "user_id", [0.40, 0.45], 0.0
    )

    linear = str(tmp_path / "linear")
    clustered_write(ev, linear, ["value"], n_files=16)
    z = str(tmp_path / "z")
    clustered_write(ev, z, ["value", "user_id"], n_files=16, zorder=True)

    assert _checksum(spark, z) == _checksum(spark, ev)
    # the linear layout is blind on the second dimension...
    assert pruning_fraction(linear, "user_id", u_lo, u_hi) == 0.0
    # ...the Z layout prunes on BOTH
    assert pruning_fraction(z, "value", v_lo, v_hi) >= 0.25
    assert pruning_fraction(z, "user_id", u_lo, u_hi) >= 0.25


def test_zorder_value_is_skew_immune_and_pure(spark):
    """The Z value ranks by quantile bucket, so a heavy-tailed column still
    spreads across the Z domain; the column is a pure expression (no
    shuffle introduced — the plan must contain no Exchange or Window)."""
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"),
        # heavy tail: 90% of mass at tiny values, 10% huge
        F.when(F.col("id") % 10 == 0, F.col("id") * 1000.0)
        .otherwise(F.col("id") % 7 + 0.0)
        .alias("x"),
        (F.col("id") % 100).cast("double").alias("y"),
    )
    zdf = zorder_value(df, ["x", "y"])
    plan = zdf._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Window" not in plan
    zs = [r["__z"] for r in zdf.select("__z").collect()]
    # skew immunity: the z values use a wide range, not a couple of codes
    assert len(set(zs)) > 100


def test_clustered_write_with_directory_partitioning(spark, tmp_path):
    """partition_cols composes: directory pruning first, then stats inside
    each directory."""
    ev = _events(spark).withColumn(
        "bucket", (F.col("user_id") % 4).cast("int")
    )
    path = str(tmp_path / "parts")
    clustered_write(
        ev, path, ["value"], n_files=4, partition_cols=["bucket"]
    )
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert set(r["bucket"] for r in back.select("bucket").distinct().collect()) == {
        0, 1, 2, 3
    }
    # stats still narrow inside a partition directory
    import os

    sub = os.path.join(path, "bucket=0")
    envs = file_envelopes(sub, ["value"])
    assert len(envs) >= 2
    spans = sorted(e["value"][1] - e["value"][0] for e in envs)
    full = max(e["value"][1] for e in envs) - min(e["value"][0] for e in envs)
    assert spans[len(spans) // 2] < full / 2  # median file spans < half domain


def test_zorder_rejects_degenerate_dims(spark):
    ev = _events(spark)
    with pytest.raises(ValueError):
        zorder_value(ev, ["value"])
    with pytest.raises(ValueError):
        zorder_value(ev, ["value", "user_id", "event_id", "value"])
