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
