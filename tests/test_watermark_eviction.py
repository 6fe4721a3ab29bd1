"""True multi-batch watermark semantics: with the file source throttled to
one file per trigger, a row arriving after its window was finalized (event
time behind the watermark) is DROPPED from an append-mode windowed
aggregate. This is the behavior the reference's `$gt lastUpdated` scan has
silently (SURVEY.md §3; `s_late_data` makes it observable in batch).

Note the one-batch lag Spark applies between advancing the watermark and
using it to filter late records: the window closes in the batch after its
watermark passes, so the late file arrives two batches after the data that
advanced the watermark."""

from __future__ import annotations

import datetime
import time

from pyspark.sql import functions as F


def test_late_row_dropped_across_micro_batches(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    day = datetime.datetime(2024, 3, 1)

    def mk(day_offset: int, event_id: int) -> tuple:
        return (
            event_id,
            day + datetime.timedelta(days=day_offset, hours=1),
            1,
            "click",
            10.0,
            "{}",
        )

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    # batch 0: day 0 + day 3 → watermark will advance to day2
    spark.createDataFrame([mk(0, 1), mk(3, 2)], schema).coalesce(1).write.parquet(
        f"{src}/f1"
    )
    time.sleep(1.2)  # file source orders batches by modification time
    # batch 1: day 4 → day0's window is finalized and emitted this batch
    spark.createDataFrame([mk(4, 4)], schema).coalesce(1).write.parquet(f"{src}/f2")
    time.sleep(1.2)
    # batch 2: a LATE row back on day 0 — window closed → must be dropped
    spark.createDataFrame([mk(0, 3)], schema).coalesce(1).write.parquet(f"{src}/f3")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
    )
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("day"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_wm_evict")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    day0_rows = [
        r["n"]
        for r in spark.sql("SELECT * FROM t_wm_evict").collect()
        if str(r["day"]).startswith("2024-03-01")
    ]
    # exactly one emission for day 0, and the late event_id=3 is not in it
    assert day0_rows == [1], day0_rows
