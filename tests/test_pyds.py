"""Python DataSource REST source (sources/pyds.py): executor-parallel
fetch matches the driver-side source row for row, partitioning honors the
option, and the format behaves like any first-class source."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metrics_database_cron_script_spark.sources.pyds import (
    deterministic_fake_fetch,
    resolve_fetcher,
    rest_point_frame,
)

URLS = [(f"2024-01-{d:02d}", f"https://api.example.test/history/{d}-1-2024") for d in range(1, 11)]
PATH = "$.market_data.current_price.usd"


def test_matches_driver_side_source(spark):
    from metrics_database_cron_script_spark.sources.rest import rest_point_source

    dist = rest_point_frame(spark, URLS, PATH, value_alias="price")
    drv = rest_point_source(
        spark, URLS, deterministic_fake_fetch, PATH, value_alias="price"
    )
    assert sorted(map(tuple, dist.collect())) == sorted(map(tuple, drv.collect()))


def test_partitioning_honors_option(spark):
    df = rest_point_frame(spark, URLS, PATH, num_partitions=3)
    parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert parts == 3
    assert df.count() == len(URLS)
    # more partitions than URLs: empty chunks dropped, rows preserved
    df1 = rest_point_frame(spark, URLS[:2], PATH, num_partitions=8)
    assert df1.count() == 2


def test_empty_urls(spark):
    assert rest_point_frame(spark, [], PATH).count() == 0


def test_fetcher_ref_validation():
    with pytest.raises(ValueError):
        resolve_fetcher("no_attr_separator")
    fn = resolve_fetcher(
        "metrics_database_cron_script_spark.sources.pyds:deterministic_fake_fetch"
    )
    assert fn("u") == deterministic_fake_fetch("u")
