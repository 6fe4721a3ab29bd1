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
