"""Python DataSource (Spark 4 API) for the REST point source — the
partition-parallel scale path for R6/R7.

`sources/rest.py` fetches on the driver — correct for the reference's
day-cardinality price dim (updatescript.py:39-51), wrong once the URL
list is large (the driver serializes the whole fetch). This module is
the same contract as a first-class `spark.read.format(...)` source: URL
batches become InputPartitions, each executor task fetches its batch
concurrently, and the payloads enter the plan as ordinary rows — fetch
throughput scales with the cluster, not the driver.

The fetch callable is injected as an importable reference
("module:attr", resolved on the EXECUTOR — DataSource options are
strings, and this keeps the source picklable and the test fetcher
deterministic offline, same injection philosophy as rest.py). The
container has no egress, so the bundled fetcher is a deterministic fake;
a real deployment points the option at a requests-based callable.
"""

from __future__ import annotations

import hashlib
import importlib
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

FORMAT_NAME = "rest_point"


def resolve_fetcher(ref: str):
    """'pkg.module:attr' → the callable. Executor-side import — the module
    must be importable from the worker (same env as the driver here)."""
    mod, _, attr = ref.partition(":")
    if not attr:
        raise ValueError(f"fetcher ref must be 'module:attr', got {ref!r}")
    return getattr(importlib.import_module(mod), attr)


def deterministic_fake_fetch(url: str) -> str:
    """Offline stand-in for the CoinGecko history endpoint: a price derived
    from md5(url) — stable across processes, no network."""
    h = int(hashlib.md5(url.encode()).hexdigest()[:8], 16)
    price = round((h % 100_000) / 100.0, 2)
    return json.dumps({"market_data": {"current_price": {"usd": price}}})


class _UrlBatch(InputPartition):
    def __init__(self, pairs):
        self.pairs = pairs  # list[[key, url]]


class RestPointReader(DataSourceReader):
    def __init__(self, options):
        self.urls = json.loads(options["urls"])
        self.fetcher_ref = options["fetcher"]
        self.num_partitions = int(options.get("numPartitions", "4"))

    def partitions(self):
        n = max(1, self.num_partitions)
        chunks = [self.urls[i::n] for i in range(n)]
        parts = [_UrlBatch(c) for c in chunks if c]
        return parts or [_UrlBatch([])]

    def read(self, partition):
        fetch = resolve_fetcher(self.fetcher_ref)
        for key, url in partition.pairs:
            yield (key, fetch(url))


class RestPointStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the REST source (round-6 verdict item 3): the
    day-spine URL list consumed as MICROBATCHES of `batchSize` urls, with
    the stream OFFSET = the index into the list. That makes the source a
    real Structured Streaming citizen: offsets checkpoint/restart exactly
    (an interrupted run resumes at the first unfetched URL), and replay of
    a committed range (`readBetweenOffsets`) re-fetches deterministically
    — sound for the history endpoint because each URL names an immutable
    past day (R6's contract; a mutable endpoint would need the fetch
    payloads checkpointed instead, which is the WAL-sink job, not the
    source's). New days append to the list in a live deployment, so the
    latest offset keeps advancing exactly like a file-source listing.

    SimpleDataSourceStreamReader runs driver-side — the right half of the
    trade for a day-cardinality feed (one HTTP call per day per batch);
    the partition-parallel executor fetch stays the BATCH reader's job."""

    def __init__(self, options):
        self.urls = json.loads(options["urls"])
        self.fetcher_ref = options["fetcher"]
        self.batch_size = int(options.get("batchSize", "8"))

    def initialOffset(self):
        return {"i": 0}

    def _rows(self, i: int, j: int):
        fetch = resolve_fetcher(self.fetcher_ref)
        return iter([(key, fetch(url)) for key, url in self.urls[i:j]])

    def read(self, start):
        i = int(start["i"])
        j = min(len(self.urls), i + max(1, self.batch_size))
        return self._rows(i, j), {"i": j}

    def readBetweenOffsets(self, start, end):
        # replay after restart: same urls → same deterministic payloads
        return self._rows(int(start["i"]), int(end["i"]))

    def commit(self, end):
        # nothing to release: the URL list is immutable input, offsets are
        # plain indices, and the fetcher holds no per-range resources
        pass


class RestPointDataSource(DataSource):
    """format('rest_point'): options urls (JSON [[key, url], ...]),
    fetcher ('module:attr'), numPartitions (batch) / batchSize (stream).
    Readable as a batch source (executor-parallel fetch) AND as a
    streaming source (offset-checkpointed microbatches over the list)."""

    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        return "key string, payload string"

    def reader(self, schema):
        return RestPointReader(self.options)

    def simpleStreamReader(self, schema):
        return RestPointStreamReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotent format registration on this session."""
    spark.dataSource.register(RestPointDataSource)


def rest_point_frame(
    spark: SparkSession,
    urls,
    json_path: str,
    fetcher_ref: str = f"{__name__}:deterministic_fake_fetch",
    value_alias: str = "value",
    num_partitions: int = 4,
) -> DataFrame:
    """Executor-parallel twin of `rest.rest_point_source`: same output
    contract DataFrame[key, value], fetch distributed over
    `num_partitions` tasks."""
    register(spark)
    raw = (
        spark.read.format(FORMAT_NAME)
        .option("urls", json.dumps([list(p) for p in urls]))
        .option("fetcher", fetcher_ref)
        .option("numPartitions", str(num_partitions))
        .load()
    )
    return raw.select(
        "key",
        F.get_json_object(F.col("payload"), json_path)
        .cast("double")
        .alias(value_alias),
    )


def rest_point_stream(
    spark: SparkSession,
    urls,
    json_path: str,
    fetcher_ref: str = f"{__name__}:deterministic_fake_fetch",
    value_alias: str = "value",
    batch_size: int = 8,
) -> DataFrame:
    """Streaming twin of `rest_point_frame`: the same DataFrame[key, value]
    contract as an unbounded `readStream` — microbatches of `batch_size`
    URLs, offsets = list indices (RestPointStreamReader). Feed it to any
    writeStream sink; tests drain it with processAllAvailable into a
    memory sink and hash-check against the BATCH source's oracle."""
    register(spark)
    raw = (
        spark.readStream.format(FORMAT_NAME)
        .option("urls", json.dumps([list(p) for p in urls]))
        .option("fetcher", fetcher_ref)
        .option("batchSize", str(batch_size))
        .load()
    )
    return raw.select(
        "key",
        F.get_json_object(F.col("payload"), json_path)
        .cast("double")
        .alias(value_alias),
    )
