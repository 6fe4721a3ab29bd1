"""Time-window operators, batch-executable (SURVEY.md §2.C `s_*`).

The reference's only notion of time windows is its daily buckets (R4/R18,
updatescript.py:34,64) and its manual watermark (R2/R25). Here the full
streaming window family — tumbling, sliding, session — is implemented with
the same `F.window`/`F.session_window` expressions Structured Streaming uses,
but run in batch mode so the DuckDB oracle can check them; `structured.py`
wraps the identical logic in a readStream/writeStream pipeline.

Late-data policy (SURVEY.md §7.3 #6): the reference silently drops rows
backfilled behind its watermark (`$gt lastUpdated`, updatescript.py:59). We
make the drop observable — `late_data_flags` tags every row instead of
losing it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling(events: DataFrame, size: str = "1 day") -> DataFrame:
    return (
        events.groupBy(F.window("ts", size).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n",
            "total",
        )
    )


def sliding(events: DataFrame, size: str = "1 hour", slide: str = "15 minutes") -> DataFrame:
    return (
        events.groupBy(F.window("ts", size, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n",
            "total",
        )
    )


def session(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows: a session closes when no event arrives
    within `gap` of the last one; window end = last event + gap."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n",
            "total",
        )
    )


def session_gaps_islands(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """The same sessionization as `session()` built from first principles
    (lag + cumulative sum over gap markers) — the form that generalizes to
    engines without session_window, and the cross-check for boundary-tie
    semantics (a new session starts only when the gap is STRICTLY exceeded;
    an event exactly at last_ts+gap extends the session, matching
    session_window's end-inclusive merge)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(f"INTERVAL {gap_minutes} MINUTES")
    prev = F.lag("ts").over(w)
    # STRICT >: an event exactly at prev+gap still extends the session —
    # session_window's merge is end-inclusive (caught by the boundary-tie
    # property test; fixtures alone never exercise exact ties)
    marked = events.withColumn(
        "new_sess", F.when(prev.isNull() | (F.col("ts") > prev + gap), 1).otherwise(0)
    )
    sess = marked.withColumn(
        "sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + gap).alias("session_end"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .drop("sess_id")
    )


def late_data_flags(events: DataFrame, allowed_lateness: str = "1 day") -> DataFrame:
    """Tag rows older than (max event time − allowed lateness) — the rows a
    `withWatermark` stream would drop, and the rows the reference loses
    silently. The global max is a one-row agg, broadcast into the scan."""
    horizon = events.agg(
        (F.max("ts") - F.expr(f"INTERVAL {allowed_lateness}")).alias("__horizon")
    )
    return (
        events.join(F.broadcast(horizon))
        .select("event_id", "ts", "user_id", (F.col("ts") < F.col("__horizon")).alias("is_late"))
    )
