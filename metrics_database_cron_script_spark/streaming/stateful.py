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


def run_stateful_running_totals_multibatch(
    spark: SparkSession,
    sf_dir: str,
    query_name: str | None = None,
    n_files: int = 4,
):
    """The same accumulator operator, drained as REAL multiple micro-batches
    (the single-file driver fixture otherwise arrives as one mega-batch and
    exercises no state handoff): the events table is staged as `n_files`
    range-partitioned files and streamed with maxFilesPerTrigger=1, so most
    users' accumulators are built up across several batches. Returns the
    final (user_id, n, last_ts) rows — the deterministic slice of the
    state (`total` is emitted rounded and its HALF_EVEN-vs-HALF_UP .5-tie
    ambiguity is a documented tolerance in the pytest, so the exact-hash
    oracle checks the two exactly-reproducible fields plus row identity)."""
    import shutil
    import tempfile
    import uuid as _uuid

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.sources import load_table

    if query_name is None:
        query_name = f"s_totals_{_uuid.uuid4().hex[:8]}"
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    staging = tempfile.mkdtemp(prefix="stream_totals_")
    try:
        # range-partitioned on (user_id, ts) so each user's rows span
        # several adjacent files deterministically — not one hash bucket
        ev.repartitionByRange(n_files, "user_id", "ts").write.mode(
            "overwrite"
        ).parquet(staging)
        schema = spark.read.parquet(staging).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
        )
        out = stream.groupBy("user_id").applyInPandasWithState(
            _running_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
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
        # update-mode sink holds one emission per (user, batch-touching-
        # user); n is cumulative so keep-last == max-n
        w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
        return (
            spark.table(query_name)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("user_id", "n", "last_ts")
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
