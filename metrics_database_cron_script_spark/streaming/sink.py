"""Streaming → idempotent parquet sink via foreachBatch.

Connects Structured Streaming to the engine's state layer: each micro-batch
lands through `state.idempotent_append`, so the sink is exactly-once at the
row level even across stream restarts and replayed batches (the checkpoint
gives at-least-once delivery; the anti-join turns it into exactly-once —
the same guarantee the reference fakes with per-row `find_one` probes,
updatescript.py:62)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from metrics_database_cron_script_spark.state import idempotent_append
from metrics_database_cron_script_spark.streaming.structured import read_events_stream


def stream_to_idempotent_sink(
    spark: SparkSession,
    sf_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    key: str = "event_id",
    query_name: str = "stream_sink",
) -> int:
    """Drain the events stream into an idempotent parquet sink. Returns the
    number of rows in the sink afterwards."""
    events = read_events_stream(spark, sf_dir)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        idempotent_append(batch_df, sink_path, key=key)

    q = (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(sink_path).count()
