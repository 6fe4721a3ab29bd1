"""Driver-side REST point sources (reference R6/R7).

The reference fetches per-day coin prices and live tickers from HTTP JSON APIs
inside its daily loop (``updatescript.py:39-51``, ``:120-121``). Cardinality is
tiny (days, not rows), so the idiomatic Spark shape is: fetch on the driver,
``createDataFrame`` the payloads into a small dimension table, and let the plan
broadcast it. The network call itself is injectable so tests (and this
container, which has no egress) run against a fake fetcher.

JSON path access mirrors the reference's payload paths with Spark SQL JSON
functions: ``market_data.current_price.usd`` → ``get_json_object(col,
'$.market_data.current_price.usd')``; the ticker's ``[0].current_price`` →
``get_json_object(col, '$[0].current_price')``.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Fetcher = Callable[[str], str]


def unpadded_dmy(d: date) -> str:
    """Reference R21 URL date format: d-m-Y with NO zero padding
    (``updatescript.py:39`` uses f"{day}-{month}-{year}")."""
    return f"{d.day}-{d.month}-{d.year}"


def rest_point_source(
    spark: SparkSession,
    urls: Iterable[tuple[str, str]],
    fetcher: Fetcher,
    json_path: str,
    value_alias: str = "value",
) -> DataFrame:
    """Fetch (key, url) pairs on the driver; return DataFrame[key, value].

    `json_path` is a Spark `get_json_object` path applied to each payload.
    The result is a small dim table meant to be broadcast into joins.
    """
    rows = [(key, fetcher(url)) for key, url in urls]
    if not rows:
        return spark.createDataFrame([], "key string, payload string").select(
            "key", F.lit(None).cast("double").alias(value_alias)
        )
    raw = spark.createDataFrame(rows, "key string, payload string")
    return raw.select(
        "key",
        F.get_json_object(F.col("payload"), json_path).cast("double").alias(value_alias),
    )


def fake_price_fetcher(prices: dict[str, float]) -> Fetcher:
    """Deterministic stand-in for the CoinGecko history endpoint; keyed by URL."""

    def fetch(url: str) -> str:
        price = prices.get(url, 0.0)
        return json.dumps({"market_data": {"current_price": {"usd": price}}})

    return fetch
