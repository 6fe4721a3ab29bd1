"""Execution-mode equivalence: the P2 enrichment produces the identical
exactly-once sink whether run as a cron batch or a streaming drain."""

from __future__ import annotations

import datetime

from tests.conftest import SF_SMOKE


def test_streaming_pipeline_matches_batch_pipeline(spark, tmp_path):
    from metrics_database_cron_script_spark.pipelines import (
        update_prices,
        update_tx_enriched,
    )
    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.streaming.pipeline import (
        run_streaming_tx_pipeline,
    )

    # batch mode (watermark at epoch → full history)
    batch_state = str(tmp_path / "batch")
    events = load_table(spark, SF_SMOKE, "events")
    import os

    os.makedirs(batch_state, exist_ok=True)
    update_prices(spark, events, batch_state)
    update_tx_enriched(spark, events, batch_state, datetime.datetime(1970, 1, 1))

    # streaming mode into a separate sink
    stream_state = str(tmp_path / "stream")
    n_stream = run_streaming_tx_pipeline(spark, SF_SMOKE, stream_state, "t_tx_pipe")

    a = spark.read.parquet(f"{batch_state}/tx_enriched.parquet")
    b = spark.read.parquet(f"{stream_state}/tx_enriched.parquet")
    assert n_stream == a.count() == b.count() > 0
    cols = ["event_id", "price", "txDollarValue"]
    assert a.select(cols).subtract(b.select(cols)).count() == 0
    assert b.select(cols).subtract(a.select(cols)).count() == 0

    # re-drain: idempotent sink absorbs the replay
    n_again = run_streaming_tx_pipeline(
        spark, SF_SMOKE, str(tmp_path / "stream2_state"), "t_tx_pipe2"
    )
    assert n_again == n_stream
