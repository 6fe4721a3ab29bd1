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
