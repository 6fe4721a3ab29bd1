"""Structured Streaming executes the same logic as batch (SURVEY.md §7 #4)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_streaming_tumbling_matches_batch(spark):
    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.streaming.structured import (
        run_streaming_tumbling,
    )
    from metrics_database_cron_script_spark.streaming.windows import tumbling

    stream_out = run_streaming_tumbling(spark, SF_SMOKE, query_name="t_stream_tumb")
    batch_out = tumbling(load_table(spark, SF_SMOKE, "events"))
    a = {tuple(r) for r in stream_out.collect()}
    b = {tuple(r) for r in batch_out.collect()}
    assert a == b and len(a) > 0


def test_streaming_dedup_runs(spark):
    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.streaming.structured import (
        run_streaming_dedup,
    )

    out = run_streaming_dedup(spark, SF_SMOKE, query_name="t_stream_dedup")
    got = {(r["event_type"], r["n"]) for r in out.collect()}
    events = load_table(spark, SF_SMOKE, "events")
    want = {
        (r["event_type"], r["n"])
        for r in events.groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    assert got == want


def test_streaming_session_matches_batch(spark):
    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.streaming.structured import (
        run_streaming_session,
    )
    from metrics_database_cron_script_spark.streaming.windows import session

    stream_out = run_streaming_session(spark, SF_SMOKE, query_name="t_stream_sess")
    batch_out = session(load_table(spark, SF_SMOKE, "events"))
    a = {tuple(r) for r in stream_out.collect()}
    b = {tuple(r) for r in batch_out.collect()}
    assert a == b and len(a) > 0


def test_streaming_sliding_matches_batch(spark):
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.streaming.structured import (
        read_events_stream,
    )
    from metrics_database_cron_script_spark.streaming.windows import sliding

    events = read_events_stream(spark, SF_SMOKE)
    agg = (
        events.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n",
            "total",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_stream_slide")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    a = {tuple(r) for r in spark.sql("SELECT * FROM t_stream_slide").collect()}
    b = {tuple(r) for r in sliding(load_table(spark, SF_SMOKE, "events")).collect()}
    assert a == b and len(a) > 0


def test_streaming_enrichment_matches_batch(spark):
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.operators.reference_ops import (
        daily_price_dim,
    )
    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.streaming.structured import (
        run_streaming_enrichment,
    )

    got = {tuple(r) for r in run_streaming_enrichment(spark, SF_SMOKE, "t_enrich").collect()}
    events = load_table(spark, SF_SMOKE, "events")
    dim = daily_price_dim(events)
    want = {
        tuple(r)
        for r in events.join(F.broadcast(dim), F.to_date(events["ts"]) == dim["date"])
        .groupBy("date")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_interval_self_join_matches_batch(spark):
    from metrics_database_cron_script_spark.plans import QUERIES
    from metrics_database_cron_script_spark.streaming.structured import (
        run_streaming_interval_self_join,
    )

    got = {tuple(r) for r in run_streaming_interval_self_join(spark, SF_SMOKE, 10, "t_ssj").collect()}
    want = {tuple(r) for r in QUERIES["c_self_join"](spark, SF_SMOKE).collect()}
    assert got == want and len(got) > 0


def test_streaming_left_outer_join_emits_unmatched(spark):
    """Stream-stream LEFT OUTER interval join: matched pairs agree with the
    batch inner join, and events with no follow-up within the interval
    surface exactly once, null-padded, after watermark expiry."""
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.streaming.structured import (
        run_streaming_left_outer_join,
    )

    got = run_streaming_left_outer_join(spark, SF_SMOKE, 10, "t_lsj").collect()
    matched = {(r["first_id"], r["next_id"]) for r in got if r["next_id"] is not None}
    unmatched = {r["first_id"] for r in got if r["next_id"] is None}

    ev = load_table(spark, SF_SMOKE, "events")
    a = ev.select(
        F.col("event_id").alias("first_id"),
        "user_id",
        F.col("ts").alias("ts_a"),
    )
    b = ev.select(
        F.col("event_id").alias("next_id"),
        F.col("user_id").alias("user_b"),
        F.col("ts").alias("ts_b"),
    )
    cond = (
        (a["user_id"] == b["user_b"])
        & (b["ts_b"] > a["ts_a"])
        & (b["ts_b"] <= a["ts_a"] + F.expr("INTERVAL 10 MINUTES"))
    )
    batch_pairs = {
        (r["first_id"], r["next_id"])
        for r in a.join(b, cond).select("first_id", "next_id").collect()
    }
    assert matched == batch_pairs
    batch_matched_firsts = {p[0] for p in batch_pairs}
    n_events = ev.count()
    # every event appears: either matched at least once or exactly one null row
    assert unmatched.isdisjoint(batch_matched_firsts)
    # null-padded rows exist for SOME events (the fixture has sparse users),
    # and total coverage is complete up to watermark-held tail rows
    assert len(unmatched) > 0
    assert len(unmatched) + len(batch_matched_firsts) <= n_events


def test_stream_source_reads_directory_layout(spark, tmp_path):
    """Regression: a DIRECTORY events table (presplit/multi-file layouts)
    used to stream ZERO rows silently — the glob matched file base names
    only. The source must drain the same rows for both layouts."""
    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.streaming.structured import (
        run_streaming_tumbling,
    )

    dir_sf = str(tmp_path / "sf_dir")
    ev = load_table(spark, SF_SMOKE, "events")
    ev.repartition(3).write.parquet(f"{dir_sf}/events.parquet")

    import uuid

    got_dir = run_streaming_tumbling(
        spark, dir_sf, query_name=f"t_dirlay_{uuid.uuid4().hex[:8]}"
    )
    got_file = run_streaming_tumbling(
        spark, SF_SMOKE, query_name=f"t_filelay_{uuid.uuid4().hex[:8]}"
    )
    assert got_dir.agg({"n": "sum"}).collect()[0][0] == ev.count()
    a = sorted(tuple(r) for r in got_dir.collect())
    b = sorted(tuple(r) for r in got_file.collect())
    assert a == b


def test_dedup_within_watermark_variant_runs(spark):
    """The bounded-state dedup variant must execute as a real streaming
    query; its survivor set is a superset-of-equal-keys story (duplicates
    beyond the horizon re-admit), so assert bounds, not equality."""
    import uuid

    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.streaming.structured import (
        run_streaming_dedup,
    )

    exact = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    got = run_streaming_dedup(
        spark,
        SF_SMOKE,
        query_name=f"t_wmdedup_{uuid.uuid4().hex[:8]}",
        subset=["user_id", "event_type"],
        within_watermark=True,
    )
    total = got.agg({"n": "sum"}).collect()[0][0]
    assert total >= exact  # horizon re-admissions can only add survivors
