"""Property test for sessionization boundary semantics (SURVEY.md §7.3 #2):
native `session_window` and the lag+cumsum gaps-and-islands rewrite must
agree on EVERY generated event set — including events exactly at the
30-minute gap boundary (the tie case where >= vs > silently diverges)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = datetime.datetime(2024, 5, 1)

# minute offsets drawn so exact-30-minute gaps occur often
offset_strategy = st.lists(
    st.sampled_from([0, 1, 5, 29, 30, 31, 60, 90, 120]),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    per_user=st.dictionaries(
        st.integers(0, 2), offset_strategy, min_size=1, max_size=3
    )
)
def test_session_window_matches_islands(spark, per_user):
    from metrics_database_cron_script_spark.streaming.windows import (
        session,
        session_gaps_islands,
    )

    rows = []
    eid = 0
    for user, offsets in per_user.items():
        t = BASE
        for off in offsets:
            t = t + datetime.timedelta(minutes=off)
            rows.append((eid, t, user, "click", 1.0, "{}"))
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    a = {tuple(r) for r in session(events).collect()}
    b = {tuple(r) for r in session_gaps_islands(events).collect()}
    assert a == b
