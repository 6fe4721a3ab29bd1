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


# ------------------------------------------------- streaming reader (round 7)


def test_stream_reader_offsets_and_replay():
    """Offset arithmetic and replay determinism WITHOUT a running stream:
    read() advances the index by batchSize, drains to the list end, and
    readBetweenOffsets (the restart/replay path) returns exactly the rows
    the original microbatch produced."""
    import json as _json

    from metrics_database_cron_script_spark.sources.pyds import (
        RestPointStreamReader,
    )

    r = RestPointStreamReader(
        {
            "urls": _json.dumps([list(p) for p in URLS]),
            "fetcher": "metrics_database_cron_script_spark.sources.pyds"
            ":deterministic_fake_fetch",
            "batchSize": "4",
        }
    )
    assert r.initialOffset() == {"i": 0}
    rows1, off1 = r.read({"i": 0})
    rows1 = list(rows1)
    assert off1 == {"i": 4} and len(rows1) == 4
    rows2, off2 = r.read(off1)
    rows3, off3 = r.read(off2)
    assert off3 == {"i": 10} and len(list(rows3)) == 2  # tail batch
    # drained: further reads yield nothing and the offset stays put
    tail, off4 = r.read(off3)
    assert list(tail) == [] and off4 == {"i": 10}
    # replay of the first committed range is byte-identical
    assert list(r.readBetweenOffsets({"i": 0}, {"i": 4})) == rows1
    assert [k for k, _ in rows1] == [k for k, _ in URLS[:4]]


def test_stream_matches_batch_source(spark):
    """End-to-end streaming drain (readStream → memory sink) produces the
    SAME rows as the batch reader over the same URL list — the two
    modalities of the source must agree."""
    import uuid

    from metrics_database_cron_script_spark.sources.pyds import (
        rest_point_stream,
    )

    name = f"pyds_stream_{uuid.uuid4().hex[:8]}"
    stream = rest_point_stream(spark, URLS, PATH, batch_size=3)
    assert stream.isStreaming
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        # multiple microbatches actually ran (10 urls / batch 3 → 4)
        assert len(q.recentProgress) >= 4
    finally:
        q.stop()
    got = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
    want = sorted(map(tuple, rest_point_frame(spark, URLS, PATH).collect()))
    assert got == want
