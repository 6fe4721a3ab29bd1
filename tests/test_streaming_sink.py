from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_stream_to_idempotent_sink_exactly_once(spark, tmp_path):
    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.streaming.sink import (
        stream_to_idempotent_sink,
    )

    sink = str(tmp_path / "sink.parquet")
    total = load_table(spark, SF_SMOKE, "events").count()

    n1 = stream_to_idempotent_sink(
        spark, SF_SMOKE, sink, str(tmp_path / "ckpt1"), query_name="t_sink1"
    )
    assert n1 == total

    # replay with a FRESH checkpoint: the file source re-delivers everything;
    # the anti-join sink must not duplicate a single row
    n2 = stream_to_idempotent_sink(
        spark, SF_SMOKE, sink, str(tmp_path / "ckpt2"), query_name="t_sink2"
    )
    assert n2 == total
    ids = spark.read.parquet(sink).select("event_id").distinct().count()
    assert ids == total
