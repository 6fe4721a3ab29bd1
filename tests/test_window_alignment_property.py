"""Property test: tumbling/sliding window assignment matches a from-scratch
computation on events placed exactly AT window boundaries (half-open
[start, end) semantics, epoch-aligned slide marks)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = datetime.datetime(2024, 6, 1)

# minute/second offsets that land exactly on :00/:15/:30/:45 marks and just
# around them
offset_minutes = st.sampled_from([0, 1, 14, 15, 16, 29, 30, 44, 45, 59, 60, 75])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(offset_minutes, min_size=1, max_size=10))
def test_sliding_window_assignment_matches_manual(spark, offsets):
    from metrics_database_cron_script_spark.streaming.windows import sliding

    rows = [
        (i, BASE + datetime.timedelta(minutes=off), 1, "click", 1.0, "{}")
        for i, off in enumerate(offsets)
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {
        (r["win_start"], r["win_end"], r["n"])
        for r in sliding(events, "1 hour", "15 minutes").collect()
    }

    # manual: every event belongs to the 4 hour-long windows whose 15-min-
    # aligned start satisfies start <= ts < start + 1h (half-open)
    from collections import Counter

    counts: Counter = Counter()
    for _, ts, *_ in rows:
        epoch_min = int((ts - datetime.datetime(1970, 1, 1)).total_seconds() // 60)
        last_mark = (epoch_min // 15) * 15
        for k in range(4):
            start_min = last_mark - 15 * k
            start = datetime.datetime(1970, 1, 1) + datetime.timedelta(minutes=start_min)
            if start <= ts < start + datetime.timedelta(hours=1):
                counts[start] += 1
    want = {
        (start, start + datetime.timedelta(hours=1), n) for start, n in counts.items()
    }
    assert got == want
