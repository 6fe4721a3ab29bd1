from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import SF_SMOKE


def test_decimal_money_mode_schema_and_agreement(spark):
    """SURVEY.md §4.3: the decimal flag runs the identical plan in
    DecimalType(38,18). Values must agree with the double mode to float
    precision, and the decimal sum must be exact under reordering."""
    from metrics_database_cron_script_spark.operators.reference_ops import tx_enrich
    from metrics_database_cron_script_spark.sources import load_table

    events = load_table(spark, SF_SMOKE, "events")
    dbl = tx_enrich(events, money="double")
    dec = tx_enrich(events, money="decimal")
    assert isinstance(dbl.schema["txDollarValue"].dataType, T.DoubleType)
    assert isinstance(dec.schema["txDollarValue"].dataType, T.DecimalType)

    joined = dbl.select("event_id", F.col("txDollarValue").alias("d")).join(
        dec.select("event_id", F.col("txDollarValue").cast("double").alias("x")),
        "event_id",
    )
    mismatches = joined.filter(F.abs(F.col("d") - F.col("x")) > 1e-6).count()
    assert mismatches == 0

    # decimal sum is order-independent (exact); assert both orderings agree
    s1 = dec.agg(F.sum("txDollarValue")).collect()[0][0]
    s2 = dec.orderBy(F.col("event_id").desc()).agg(F.sum("txDollarValue")).collect()[0][0]
    assert s1 == s2


def test_decimal_routing_mode_schema_and_agreement(spark):
    """R23 routing in decimal mode: identical row set, volumes exact
    DecimalType — delta chains are where float drift first shows at scale
    (the oracled comparison surface is r_aum_routing_decimal; here we pin
    the internal decimal schema and double-mode agreement)."""
    from metrics_database_cron_script_spark.operators.reference_ops import aum_routing
    from metrics_database_cron_script_spark.sources import load_table

    events = load_table(spark, SF_SMOKE, "events")
    dbl = aum_routing(events)
    dec = aum_routing(events, money="decimal")
    assert isinstance(dbl.schema["volume"].dataType, T.DoubleType)
    assert isinstance(dec.schema["volume"].dataType, T.DecimalType)

    key = ["event_id", "sink"]
    joined = dbl.select(*key, F.col("volume").alias("d")).join(
        dec.select(*key, F.col("volume").cast("double").alias("x")), key
    )
    assert joined.count() == dbl.count()  # same routed row set
    assert joined.filter(F.abs(F.col("d") - F.col("x")) > 1e-6).count() == 0

    # exactness: the decimal AUM sum is reorder-invariant
    aum = dec.filter(F.col("sink") == "aum")
    s1 = aum.agg(F.sum("volume")).collect()[0][0]
    s2 = aum.orderBy(F.col("event_id").desc()).agg(F.sum("volume")).collect()[0][0]
    assert s1 == s2


def test_update_prices_with_rest_source(spark, tmp_path):
    """P1 via the REST point source: injected fetcher → {date, price} dim →
    idempotent append (reference R6, updatescript.py:39-43)."""
    import datetime

    from metrics_database_cron_script_spark.pipelines import update_prices
    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.sources.rest import (
        fake_price_fetcher,
        rest_point_source,
        unpadded_dmy,
    )

    days = [datetime.date(2024, 1, d) for d in (1, 2, 3)]
    urls = [(d.isoformat(), f"https://api/history?date={unpadded_dmy(d)}") for d in days]
    fetcher = fake_price_fetcher({u: 10.0 + i for i, (_, u) in enumerate(urls)})
    dim = (
        rest_point_source(spark, urls, fetcher, "$.market_data.current_price.usd", "price")
        .select(F.col("key").cast("date").alias("date"), "price")
    )
    state = str(tmp_path / "state")
    events = load_table(spark, SF_SMOKE, "events")
    assert update_prices(spark, events, state, price_source=dim) == 3
    assert update_prices(spark, events, state, price_source=dim) == 0  # idempotent
    rows = {str(r["date"]): r["price"] for r in spark.read.parquet(f"{state}/prices.parquet").collect()}
    assert rows == {"2024-01-01": 10.0, "2024-01-02": 11.0, "2024-01-03": 12.0}
