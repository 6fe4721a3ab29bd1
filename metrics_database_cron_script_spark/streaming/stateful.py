"""Custom stateful streaming operator via `applyInPandasWithState`.

The reference's only state is its loop-carried seen-stash set and watermark
(R15/R25); here is the general facility: an arbitrary per-key accumulator
maintained across micro-batches in the state store. The example operator is
running per-user totals (count + sum + last event time) — the streaming
version of the cumulative window in `c_window_frame` — with the state schema
declared, a processing-time timeout available for eviction, and update-mode
emission of the keys touched in each batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from metrics_database_cron_script_spark.streaming.structured import read_events_stream

OUTPUT_SCHEMA = "user_id long, n long, total double, last_ts timestamp"
# last_ts lives IN the state: an accumulator field computed only from the
# current micro-batch would silently reset per batch. total is stored at
# full precision — rounding belongs at emission only (re-rounding the
# running sum every batch accumulates double-rounding drift vs the batch
# oracle's single round(sum(value), 6)).
STATE_SCHEMA = "n long, total double, last_ts timestamp"


def _running_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_ts = state.get
    else:
        n, total, last_ts = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        [(user_id, n, round(total, 6), last_ts)],
        columns=["user_id", "n", "total", "last_ts"],
    )


def run_stateful_running_totals(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_stateful",
) -> DataFrame:
    """Drain the events stream through the stateful operator; returns the
    final per-user accumulator rows (update mode → last emission per key)."""
    events = read_events_stream(spark, sf_dir)
    out = (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update-mode memory sink appends each batch's emissions; the final state
    # per key is the row from the latest batch — dedup keep-last here.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    raw = spark.sql(f"SELECT * FROM {query_name}")
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    return (
        raw.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
