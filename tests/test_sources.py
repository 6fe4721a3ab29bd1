from __future__ import annotations

import datetime


def test_rest_point_source_with_fake_fetcher(spark):
    from metrics_database_cron_script_spark.sources.rest import (
        fake_price_fetcher,
        rest_point_source,
        unpadded_dmy,
    )

    urls = [
        ("2024-01-05", "https://api.example/history?date=5-1-2024"),
        ("2024-01-06", "https://api.example/history?date=6-1-2024"),
    ]
    fetcher = fake_price_fetcher(
        {urls[0][1]: 7.25, urls[1][1]: 8.5}
    )
    dim = rest_point_source(
        spark, urls, fetcher, "$.market_data.current_price.usd", value_alias="price"
    )
    got = {(r["key"], r["price"]) for r in dim.collect()}
    assert got == {("2024-01-05", 7.25), ("2024-01-06", 8.5)}


def test_unpadded_dmy_matches_reference_format():
    # reference R21: f"{day}-{month}-{year}" with NO zero padding
    from metrics_database_cron_script_spark.sources.rest import unpadded_dmy

    assert unpadded_dmy(datetime.date(2024, 1, 5)) == "5-1-2024"
    assert unpadded_dmy(datetime.date(2024, 11, 25)) == "25-11-2024"


def test_register_views_sql_surface(spark):
    """SQL over the registered views must agree with the DataFrame API, and
    predicates written in SQL must still push into the parquet scan."""
    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.sources.tables import register_views
    from tests.conftest import SF_SMOKE

    names = register_views(spark, SF_SMOKE)
    assert set(names) >= {"lineitem", "orders", "events", "documents"}
    got = spark.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1"
    ).collect()
    df = load_table(spark, SF_SMOKE, "lineitem")
    from pyspark.sql import functions as F

    want = (
        df.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
        .collect()
    )
    assert got == want
    plan = spark.sql(
        "SELECT l_orderkey FROM lineitem WHERE l_quantity > 49"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_quantity" in plan


def test_mongo_incremental_options_push_gt_watermark():
    """R2 pushdown contract for the Mongo source (updatescript.py:59): the
    strict-greater watermark must land in the connector's aggregation
    pipeline as a server-side `$match` `$gt` stage — asserted offline, no
    jar, no network."""
    import json

    from metrics_database_cron_script_spark.sources.mongo import (
        incremental_read_options,
        watermark_match_pipeline,
    )

    opts = incremental_read_options(
        "mongodb://example.invalid:27017",
        "metrics",
        "transactions",
        "ts",
        "2024-01-15 00:00:00",
    )
    assert opts["spark.mongodb.read.database"] == "metrics"
    assert opts["spark.mongodb.read.collection"] == "transactions"
    pipeline = json.loads(opts["aggregation.pipeline"])
    assert pipeline == [
        {"$match": {"ts": {"$gt": {"$date": "2024-01-15T00:00:00.000Z"}}}}
    ]

    # strictness + field parameterization + tz-aware input normalized to UTC
    import datetime

    p2 = json.loads(
        watermark_match_pipeline(
            "updatedAt",
            datetime.datetime(
                2024, 3, 1, 5, 30,
                tzinfo=datetime.timezone(datetime.timedelta(hours=5)),
            ),
        )
    )
    assert p2 == [
        {"$match": {"updatedAt": {"$gt": {"$date": "2024-03-01T00:30:00.000Z"}}}}
    ]


def test_events_since_strict_greater_at_microsecond_boundary(spark, tmp_path):
    """Round-7 regression: float datetime.timestamp() carries ~0.4 µs error
    near current epochs, which truncated a µs-precision watermark one tick
    low and re-included the boundary row on every incremental run. The
    conversion is now exact integer arithmetic: a row whose ts EQUALS the
    watermark must be excluded, the next microsecond included."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from metrics_database_cron_script_spark.sources.tables import (
        events_since,
        invalidate_caches,
    )

    base_us = 1_717_200_000_000_000  # 2024-06-01T00:00:00 in µs
    rows = [base_us + 1, base_us + 2, base_us + 1_000_000]
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf)
    pq.write_table(
        pa.table({
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([us * 1000 for us in rows], pa.int64()),  # ns
        }),
        os.path.join(sf, "events.parquet"),
    )
    invalidate_caches(sf)
    got = {
        r["event_id"]
        for r in events_since(spark, sf, "2024-06-01T00:00:00.000001").collect()
    }
    assert got == {2, 3}, got  # the ...000001 row itself is EXCLUDED

    # round-8 advice fix: a tz-AWARE ISO watermark ('...+00:00') must not
    # raise (aware − naive TypeError in the integer-micros arithmetic) and
    # must mean the same instant as the naive-UTC string above
    got_aware = {
        r["event_id"]
        for r in events_since(
            spark, sf, "2024-06-01T00:00:00.000001+00:00"
        ).collect()
    }
    assert got_aware == {2, 3}, got_aware
    # and a non-UTC offset converts: 02:00+02:00 == 00:00Z, so all rows
    # strictly after midnight UTC are included
    got_offset = {
        r["event_id"]
        for r in events_since(
            spark, sf, "2024-06-01T02:00:00+02:00"
        ).collect()
    }
    assert got_offset == {1, 2, 3}, got_offset


def test_invalidate_caches_clears_dim_and_stream_probe_caches(tmp_path):
    """Round-7 regression: 'Drop EVERY cache derived from sf_dir' now
    includes the constant-dim literal rows and the stream ts-type probe —
    both previously served stale data after a fixture rewrite."""
    from metrics_database_cron_script_spark.sources import tables as T
    from metrics_database_cron_script_spark.streaming import structured as S

    root = str(tmp_path / "sfx")
    T._dim_rows_cache[(root, "nation")] = [{"n_nationkey": 0}]
    T._dim_rows_cache[(root + "x", "nation")] = [{"n_nationkey": 1}]
    S._stream_probe_cache[("app", root + "/events.parquet")] = "long"
    S._stream_probe_cache[("app", root + "-presplit/events.parquet")] = "long"
    S._stream_probe_cache[("app", "/elsewhere/events.parquet")] = "long"
    T.invalidate_caches(root)
    assert (root, "nation") not in T._dim_rows_cache
    assert (root + "x", "nation") in T._dim_rows_cache  # sibling survives
    assert ("app", root + "/events.parquet") not in S._stream_probe_cache
    # sibling dir sharing the string prefix must NOT be cleared
    assert ("app", root + "-presplit/events.parquet") in S._stream_probe_cache
    assert ("app", "/elsewhere/events.parquet") in S._stream_probe_cache
    T.invalidate_caches()
    assert not T._dim_rows_cache and not S._stream_probe_cache
