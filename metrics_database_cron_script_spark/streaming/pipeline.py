"""The P2 enrichment pipeline in streaming execution mode.

SURVEY.md §7 milestone 4: the same logical functions, two execution modes.
`pipelines.update_tx_enriched` runs P2 as a cron batch; this module runs the
identical enrichment (tx ⋈ broadcast price dim → conditional dollar value,
updatescript.py:57-108) as a Structured Streaming query whose sink is the
same `state.idempotent_append` — so replays, restarts, and batch/stream
mixtures all converge to the same exactly-once table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metrics_database_cron_script_spark.operators.reference_ops import (
    daily_price_dim,
    tx_view,
)
from metrics_database_cron_script_spark.sources import load_table
from metrics_database_cron_script_spark.state import idempotent_append
from metrics_database_cron_script_spark.streaming.structured import read_events_stream


def enrich(tx: DataFrame, price: DataFrame) -> DataFrame:
    """The shared logical plan: works unchanged on a batch OR streaming tx
    side (stream-static broadcast join + codegen'd CASE)."""
    joined = tx.join(F.broadcast(price), F.to_date(tx["ts"]) == price["date"], "inner")
    dollar = (
        F.when(~F.col("successful"), F.lit(0.0))
        .when(F.col("stake") == F.col("alreadyBonded"), F.col("stake") * F.col("price"))
        .otherwise(F.abs(F.col("stake") - F.col("alreadyBonded")) * F.col("price"))
    )
    return joined.select(
        "event_id", "ts", "user_id", "chain", "successful", "stake",
        "alreadyBonded", "price", dollar.alias("txDollarValue"),
    )


def run_streaming_tx_pipeline(
    spark: SparkSession,
    sf_dir: str,
    state_dir: str,
    query_name: str = "stream_tx_pipeline",
) -> int:
    """Drain the events stream through the P2 enrichment into the idempotent
    tx_enriched sink. Returns rows in the sink afterwards."""
    os.makedirs(state_dir, exist_ok=True)
    sink_path = os.path.join(state_dir, "tx_enriched.parquet")
    price = daily_price_dim(load_table(spark, sf_dir, "events"))
    stream_tx = tx_view(read_events_stream(spark, sf_dir))
    enriched = enrich(stream_tx, price)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        idempotent_append(batch_df, sink_path, key="event_id")

    q = (
        enriched.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", os.path.join(state_dir, "ckpt"))
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # an all-empty stream publishes nothing (idempotent_append drops empty
    # batches and never creates the sink) — same guard as
    # sink.stream_to_idempotent_sink, whose drain this mirrors
    return (
        spark.read.parquet(sink_path).count()
        if os.path.exists(sink_path)
        else 0
    )
