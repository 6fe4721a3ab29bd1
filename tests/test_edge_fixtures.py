"""Edge-case oracle differentials: the document-table queries re-checked
against DuckDB on a hand-made pathological fixture (empty text, single
word, unicode, exact duplicates, shared prefixes) — boundary semantics the
generated sf fixtures never exercise (their docs are all well-formed).

The harness trick: check_query only needs the tables a query actually
touches, so a temp dir holding just documents.parquet drives the full
Spark-vs-DuckDB comparison for every documents-only query."""

from __future__ import annotations

import pytest

EDGE_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (1, "", "en", "s0", 0),
    (2, "word", "en", "s0", 4),
    (3, "a a a a a a", "en", "s0", 11),
    (4, "the quick brown fox jumps over the lazy dog", "en", "s1", 44),
    (5, "the quick brown fox jumps over the lazy dog", "en", "s1", 44),
    (6, "naïve café über straße", "de", "s1", 22),
    (7, "x y", "en", "s2", 3),
    (8, "one two three four five six seven eight nine ten", "en", "s2", 48),
    (9, "one two three four five six seven eight nine ten", "zh", "s2", 48),
    (10, "  ", "en", "s2", 2),
]

DOC_QUERIES = [
    "x_repetition",
    "x_word_entropy",
    "x_zipf",
    "x_boilerplate",
    "x_bigram_pmi",
    "x_vocab_coverage",
    "x_dataset_card",
    "x_quality_buckets",
    "x_token_count",
    "x_length_histogram",
    "x_exact_dedup",
    "c_array_setops",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    # single parquet FILE (not a Spark part-file directory): DuckDB's
    # read_parquet in the oracle harness addresses the file directly
    import pandas as pd

    path = tmp_path_factory.mktemp("edge_fixture")
    pdf = pd.DataFrame(
        EDGE_DOCS, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(str(path / "documents.parquet"), index=False)
    return str(path)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_edge_docs_match_oracle(spark, edge_dir, name):
    # like oracle.check_query, but registering only the documents view
    # (duckdb_connect validates every fixture file eagerly)
    import duckdb

    from metrics_database_cron_script_spark.oracle import compare
    from metrics_database_cron_script_spark.plans import ORACLES, QUERIES

    sdf = QUERIES[name](spark, edge_dir)
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{edge_dir}/documents.parquet')"
        )
        opdf = con.execute(ORACLES[name]).df()
    finally:
        con.close()
    res = compare(sdf, opdf)
    assert res["ok"], f"{name} on edge fixture: {res}"


import datetime as _dt

_T = lambda s: _dt.datetime.fromisoformat(s)

EDGE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    # exact (user, ts) ties — tie-break semantics must come from event_id
    (1, _T("2024-01-10 00:00:00"), 100, "view", 10.0, '{"k": 5}'),
    (2, _T("2024-01-10 00:00:00"), 100, "view", 11.0, '{"k": 5}'),
    # midnight-boundary rows (day-bucket / tumbling-window edges)
    (3, _T("2024-01-11 00:00:00"), 100, "click", 1.0, '{"k": 0}'),
    (4, _T("2024-01-10 23:59:59.999"), 100, "purchase", 2.0, '{"k": 1}'),
    # session gap EXACTLY 30 min (end-inclusive gap rule)
    (5, _T("2024-01-12 08:00:00"), 200, "view", 1.0, '{"k": 2}'),
    (6, _T("2024-01-12 08:30:00"), 200, "view", 1.0, '{"k": 2}'),
    (7, _T("2024-01-12 09:00:00.001"), 200, "view", 1.0, '{"k": 2}'),
    # watermark-exact ts (strict-greater scan must EXCLUDE it)
    (8, _T("2024-01-15 00:00:00"), 300, "purchase", 7.0, '{"k": 3}'),
    (9, _T("2024-01-15 00:00:00.001"), 300, "purchase", 8.0, '{"k": 3}'),
    # pre-watermark successful row → user 300 is NOT first-touch after
    (10, _T("2024-01-01 12:00:00"), 300, "purchase", 5.0, '{"k": 9}'),
    # unsuccessful (error) rows around the watermark
    (11, _T("2024-01-20 10:00:00"), 400, "error", 99.0, '{"k": 4}'),
    # single-event user, delta == 0 (stake equals alreadyBonded)
    (12, _T("2024-01-21 10:00:00"), 500, "signup", 6.0, '{"k": 6}'),
    # negative delta
    (13, _T("2024-01-22 10:00:00"), 300, "purchase", 1.0, '{"k": 9}'),
    # same user+type duplicate inside the dedup horizon
    (14, _T("2024-01-22 10:00:00"), 300, "purchase", 1.5, '{"k": 9}'),
    (15, _T("2024-01-23 00:00:00"), 500, "view", 3.0, '{"k": 0}'),
]

EVENT_QUERIES = [
    "r_daily_price_dim",
    "r_incremental_scan",
    "r_first_touch",
    "r_aum_routing",
    "r_upsert_snapshot",
    "s_tumbling",
    "s_session",
    "s_session_islands",
    "s_dedup_watermark",
    "s_windowed_topk",
    "s_late_data",
    "c_window_rank",
    "c_window_analytic",
    "c_window_frame",
    "c_struct_minmax",
    "c_unix_time",
    "c_retention_cohort",
    "c_funnel",
    "x_drift_psi",
]


@pytest.fixture(scope="module")
def edge_events_dir(spark, tmp_path_factory):
    import pandas as pd

    path = tmp_path_factory.mktemp("edge_events")
    pdf = pd.DataFrame(
        EDGE_EVENTS,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(str(path / "events.parquet"), index=False)
    return str(path)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_edge_events_match_oracle(spark, edge_events_dir, name):
    """Tie, boundary, and watermark-exact semantics checked through the
    full oracle differential on crafted events: identical (user, ts) pairs,
    midnight-edge rows, gap-exactly-30min sessions, ts == watermark
    (strict-greater must exclude), pre-watermark first-touch suppression."""
    import duckdb

    from metrics_database_cron_script_spark.oracle import compare
    from metrics_database_cron_script_spark.plans import ORACLES, QUERIES

    sdf = QUERIES[name](spark, edge_events_dir)
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{edge_events_dir}/events.parquet')"
        )
        opdf = con.execute(ORACLES[name]).df()
    finally:
        con.close()
    res = compare(sdf, opdf)
    assert res["ok"], f"{name} on edge events: {res}"
