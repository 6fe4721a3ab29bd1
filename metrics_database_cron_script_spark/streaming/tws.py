"""Stateful streaming on the Spark 4 `transformWithStateInPandas` API.

This is the successor surface to `applyInPandasWithState`
(streaming/stateful.py): typed per-key state handles (ValueState/ListState/
MapState), timers, and TTL — the API Structured Streaming is converging on
for custom stateful operators. The operator here mirrors
stateful.run_stateful_running_totals so the two APIs are directly
comparable.

Environment gate: the TWS python driver worker imports `google.protobuf`
(pyspark/sql/streaming/proto/StateMessage_pb2.py); this container does not
ship protobuf, so `tws_available()` reports False and the test suite skips.
On a cluster with protobuf installed the operator runs as-is with the
RocksDB state store provider (required by transformWithState):

    spark.sql.streaming.stateStore.providerClass =
        org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from metrics_database_cron_script_spark.streaming.structured import read_events_stream

# Same contract as stateful.OUTPUT_SCHEMA — the dispatch in
# run_running_totals_best is an environment fact, so the two paths
# must be schema-identical, last_ts included.
OUTPUT_SCHEMA = "user_id long, n long, total double, last_ts timestamp"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """True iff the transformWithStateInPandas python runtime can start
    (needs google.protobuf for the state-server protocol)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _processor():
    """Build the StatefulProcessor lazily (class body touches nothing that
    needs protobuf, but keep symmetry with the gate)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        """Per-user running (count, sum) in a typed ValueState — the
        seen-state pattern of the reference's first-touch loop (R15/R25,
        updatescript.py:175-186) on the modern state API."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            # full-precision running sum + persisted last_ts, mirroring
            # stateful.STATE_SCHEMA: round at emission only, and never let
            # the "last event time" reset to the current batch's max
            self._state = handle.getValueState(
                "totals", "n long, total double, last_ts timestamp"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total, last_ts = self._state.get() or (0, 0.0, None)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                batch_max = pdf["ts"].max()
                last_ts = (
                    batch_max if last_ts is None else max(last_ts, batch_max)
                )
            self._state.update((n, total, last_ts))
            yield pd.DataFrame(
                [(key[0], n, round(total, 6), last_ts)],
                columns=["user_id", "n", "total", "last_ts"],
            )

        def close(self) -> None:
            pass

    return RunningTotals()


def run_running_totals_best(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_totals"
) -> tuple[DataFrame, str]:
    """Environment-dispatched running totals: the `transformWithState`
    operator where its python runtime can start, else the
    `applyInPandasWithState` implementation (streaming/stateful.py) — the
    two produce identical per-user accumulators, so which engine path ran
    is an environment fact, not a semantic one. Returns (result, path)
    with path in {"transformWithState", "applyInPandasWithState"} so
    callers/tests can assert the dispatch instead of skipping."""
    if tws_available():
        return (
            run_tws_running_totals(spark, sf_dir, query_name),
            "transformWithState",
        )
    from metrics_database_cron_script_spark.streaming.stateful import (
        run_stateful_running_totals,
    )

    return (
        run_stateful_running_totals(spark, sf_dir, query_name),
        "applyInPandasWithState",
    )


def run_tws_running_totals(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_tws"
) -> DataFrame:
    """Drain the events stream through the transformWithState operator and
    return final per-user accumulators (same contract as
    stateful.run_stateful_running_totals — tests assert the two APIs and the
    batch groupBy agree)."""
    if not tws_available():
        raise ImportError("transformWithStateInPandas needs google.protobuf")
    # transformWithState requires RocksDB — but the provider conf is
    # session-wide, so restore the prior value after the drain instead of
    # silently switching every later streaming query's state store
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(prov_key, None)
    spark.conf.set(prov_key, ROCKSDB_PROVIDER)
    q = None
    try:
        # everything from here can raise (missing fixture, plan analysis,
        # .start()) — the finally must restore the provider even then,
        # not only after a successful drain
        events = read_events_stream(spark, sf_dir)
        out = (
            events.select("user_id", "ts", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=_processor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        q.processAllAvailable()
    finally:
        if q is not None:
            q.stop()
        if prev_provider is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev_provider)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    return (
        spark.table(query_name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
