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
    "x_chunk_dedup",
    "x_filter_cascade",
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


EDGE_LINEITEM = [
    # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    #  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
    # supplier 1: exact extendedprice TIES across orders → top-k tie-break
    (1, 10, 1, 1, 5.0, 100.0, 0.0, 0.0, "A", "F", _T("1996-01-01")),
    (2, 11, 1, 1, 5.0, 100.0, 0.1, 0.05, "A", "F", _T("1996-01-02")),
    (3, 12, 1, 2, 5.0, 100.0, 0.2, 0.0, "A", "O", _T("1996-01-03")),
    (3, 13, 1, 3, 5.0, 99.0, 0.2, 0.08, "A", "O", _T("1996-01-04")),
    # returnflag A: CONSTANT quantity → regr_slope/r2 undefined (NULL)
    # returnflag B: bimodal quantity {2.0×2, 7.0×2} → mode tie, lowest wins
    (4, 14, 2, 1, 2.0, 50.0, 0.0, 0.0, "B", "F", _T("1996-02-01")),
    (5, 15, 2, 1, 2.0, 60.0, 0.0, 0.0, "B", "F", _T("1996-02-02")),
    (6, 16, 2, 2, 7.0, 70.0, 0.05, 0.0, "B", "O", _T("1996-02-03")),
    (7, 17, 2, 3, 7.0, 80.0, 0.05, 0.02, "B", "O", _T("1996-02-04")),
    # returnflag C: even count → median interpolates between 1.0 and 3.0
    (8, 18, 3, 1, 1.0, 10.0, 0.0, 0.0, "C", "F", _T("1996-03-01")),
    (9, 19, 3, 2, 3.0, 20.5, 0.0, 0.04, "C", "F", _T("1996-03-02")),
]

EDGE_ORDERS = [
    # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
    (1, 7, "F", 1000.0, _T("1996-01-01"), "1-URGENT"),
    (2, 7, "O", 1000.0, _T("1996-01-02"), "2-HIGH"),      # totalprice tie
    (3, 14, "F", 500.0, _T("1996-01-03"), "3-MEDIUM"),
    # NOTE: money stays 2-decimal — the oracle contract's round(2)-is-exact
    # rule breaks on 3-decimal inputs (float sum order then changes the
    # rounded cent, as a 24999.995 row demonstrated)
    (4, 14, "O", 24999.99, _T("1996-01-04"), "4-LOW"),    # bucket boundary
    (5, 21, "F", 25000.0, _T("1996-01-05"), "5-LOW"),     # exactly on bucket edge
]

EDGE_CUSTOMER = [
    # custkey % 7 == 0 → NULL key in c_null_safe_join on BOTH sides
    (7, "Customer#7", 1, 100.0, "BUILDING"),
    (14, "Customer#14", 2, 200.0, "MACHINERY"),
    (21, "Customer#21", 3, -5.0, "BUILDING"),
    (22, "Customer#22", 3, 0.0, "AUTOMOBILE"),
]

LINEITEM_QUERIES = [
    "c_median_mode",
    "c_regr_agg",
    "c_topk_per_group",
    "c_hash_agg",
    "c_math_funcs",
    "c_try_functions",
    "c_case",
    "c_scan_project",
    "c_bitwise",
    "c_conditional_scalars",
]
ORDERS_QUERIES = [
    "c_histogram_buckets",
    "c_sort_limit",
    "c_filter",
    "c_nulls_ordering",
    "c_window_nth",
    "c_null_safe_join",
]


@pytest.fixture(scope="module")
def edge_rel_dir(spark, tmp_path_factory):
    import pandas as pd

    path = tmp_path_factory.mktemp("edge_rel")
    li = pd.DataFrame(
        EDGE_LINEITEM,
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        ],
    )
    li["l_linenumber"] = li["l_linenumber"].astype("int32")
    od = pd.DataFrame(
        EDGE_ORDERS,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    )
    cu = pd.DataFrame(
        EDGE_CUSTOMER,
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    cu["c_nationkey"] = cu["c_nationkey"].astype("int32")
    li.to_parquet(str(path / "lineitem.parquet"), index=False)
    od.to_parquet(str(path / "orders.parquet"), index=False)
    cu.to_parquet(str(path / "customer.parquet"), index=False)
    return str(path)


@pytest.mark.parametrize("name", LINEITEM_QUERIES + ORDERS_QUERIES)
def test_edge_relational_match_oracle(spark, edge_rel_dir, name):
    """Relational boundary semantics through the oracle differential:
    top-k price ties, constant-x regression groups (NULL slope/r2),
    bimodal mode ties, even-count median interpolation, zero tax/discount
    divisors, histogram bucket-edge values, NULL join keys on both sides."""
    import duckdb

    from metrics_database_cron_script_spark.oracle import compare
    from metrics_database_cron_script_spark.plans import ORACLES, QUERIES

    sdf = QUERIES[name](spark, edge_rel_dir)
    con = duckdb.connect()
    try:
        for t in ("lineitem", "orders", "customer"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{edge_rel_dir}/{t}.parquet')"
            )
        opdf = con.execute(ORACLES[name]).df()
    finally:
        con.close()
    res = compare(sdf, opdf)
    assert res["ok"], f"{name} on edge relational fixture: {res}"


# ------------------------------------------------------------- TPC-H Q21 ties

EDGE_Q21_LINEITEM = [
    # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    #  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
    # order 1: single supplier → EXISTS(other supplier) fails, never counts
    (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "F", _T("1996-01-05")),
    # order 2: s1 ships last strictly (d3 > s2's d2); s1's early line at d1
    # must NOT count (an other-supplier line shipped later)
    (2, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "F", _T("1996-02-01")),
    (2, 2, 2, 2, 1.0, 10.0, 0.0, 0.0, "N", "F", _T("1996-02-10")),
    (2, 3, 1, 3, 1.0, 10.0, 0.0, 0.0, "N", "F", _T("1996-02-20")),
    # order 3: s2 and s3 TIE at the max shipdate (k >= 2 branch): the
    # NOT-EXISTS is strict '>', so BOTH tied last-shippers count
    (3, 4, 2, 1, 1.0, 10.0, 0.0, 0.0, "N", "F", _T("1996-03-15")),
    (3, 5, 3, 2, 1.0, 10.0, 0.0, 0.0, "N", "F", _T("1996-03-15")),
    (3, 6, 3, 3, 1.0, 10.0, 0.0, 0.0, "N", "F", _T("1996-03-01")),
    # order 4: open status → excluded by the o_orderstatus = 'F' gate
    (4, 7, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _T("1996-04-01")),
    (4, 8, 2, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", _T("1996-04-02")),
]

EDGE_Q21_ORDERS = [
    (1, 7, "F", 10.0, _T("1996-01-01"), "1-URGENT"),
    (2, 7, "F", 30.0, _T("1996-02-01"), "1-URGENT"),
    (3, 14, "F", 30.0, _T("1996-03-01"), "2-HIGH"),
    (4, 14, "O", 20.0, _T("1996-04-01"), "3-MEDIUM"),
]

EDGE_Q21_SUPPLIER = [
    (1, "Supplier#1", 1, 100.0),
    (2, "Supplier#2", 1, 200.0),
    (3, "Supplier#3", 2, 300.0),
]


@pytest.fixture(scope="module")
def edge_q21_dir(spark, tmp_path_factory):
    import pandas as pd

    path = tmp_path_factory.mktemp("edge_q21")
    pd.DataFrame(
        EDGE_Q21_LINEITEM,
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        ],
    ).to_parquet(str(path / "lineitem.parquet"), index=False)
    pd.DataFrame(
        EDGE_Q21_ORDERS,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    ).to_parquet(str(path / "orders.parquet"), index=False)
    pd.DataFrame(
        EDGE_Q21_SUPPLIER,
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    ).to_parquet(str(path / "supplier.parquet"), index=False)
    return str(path)


def test_edge_q21_tie_semantics(spark, edge_q21_dir):
    """The Q21 de-correlation (window/agg rewrite of the double-correlated
    EXISTS / NOT-EXISTS) against both the DuckDB correlated original AND
    hand-derived expected counts, on a fixture built to hit every branch:
    single-supplier order (EXISTS fails), strict last-shipper (m2 path),
    tied last-shippers (k>=2 path), early line of a qualifying supplier
    (must not count), and an excluded open order."""
    import duckdb

    from metrics_database_cron_script_spark.oracle import compare
    from metrics_database_cron_script_spark.plans import ORACLES, QUERIES

    sdf = QUERIES["c_tpch_q21_shape"](spark, edge_q21_dir)
    rows = {r["s_name"]: r["numwait"] for r in sdf.collect()}
    # order 2 → s1 only (line at d3); order 3 → one line each for s2 and s3
    assert rows == {"Supplier#1": 1, "Supplier#2": 1, "Supplier#3": 1}

    con = duckdb.connect()
    try:
        for t in ("lineitem", "orders", "supplier"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{edge_q21_dir}/{t}.parquet')"
            )
        opdf = con.execute(ORACLES["c_tpch_q21_shape"]).df()
    finally:
        con.close()
    res = compare(sdf, opdf)
    assert res["ok"], f"c_tpch_q21_shape on tie fixture: {res}"


def test_udf_dollar_value_matches_case_on_nulls(spark):
    """Regression: the pandas-UDF dollar formula must match the built-in
    CASE expression under three-valued NULL semantics too — NULL
    `successful` skips the first branch, NULL operands propagate to NULL
    — not just on clean rows."""
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.functions.udfs import tx_dollar_value

    df = spark.createDataFrame(
        [
            (1, True, 5.0, 5.0, 2.0),     # equal stakes
            (2, True, 5.0, 3.0, 2.0),     # delta
            (3, False, 5.0, 3.0, 2.0),    # unsuccessful
            (4, None, 5.0, 5.0, 2.0),     # NULL successful -> falls through
            (5, True, 5.0, None, 2.0),    # NULL bonded -> NULL
            (6, None, 5.0, None, 2.0),    # NULL, NULL -> NULL
            (7, False, None, None, 2.0),  # unsuccessful wins -> 0.0
        ],
        "id long, successful boolean, stake double, bonded double, price double",
    )
    case = (
        F.when(~F.col("successful"), F.lit(0.0))
        .when(F.col("stake") == F.col("bonded"), F.col("stake") * F.col("price"))
        .otherwise(F.abs(F.col("stake") - F.col("bonded")) * F.col("price"))
    )
    got = df.select(
        "id",
        case.alias("sql"),
        tx_dollar_value("successful", "stake", "bonded", "price").alias("udf"),
    ).collect()
    for r in got:
        assert r["sql"] == r["udf"], (r["id"], r["sql"], r["udf"])


def test_multimodal_udfs_survive_null_payloads(spark):
    """Regression: a NULL binary payload (np.frombuffer(None) raises) must
    behave like an empty blob in all three mapInPandas surfaces."""
    from metrics_database_cron_script_spark.functions.multimodal import (
        byte_feature_extract,
        frame_sample,
        resize_bytes,
    )

    blobs = spark.createDataFrame(
        [(1, b"abcdef"), (2, None), (3, b"")],
        "doc_id long, payload binary",
    )
    feats = {r["doc_id"]: r["n_bytes"] for r in byte_feature_extract(blobs).collect()}
    assert feats == {1: 6, 2: 0, 3: 0}
    assert frame_sample(blobs, frame_size=2, every_k=1).count() == 3  # doc 1 only
    rs = {r["doc_id"]: r["orig_bytes"] for r in resize_bytes(blobs).collect()}
    assert rs == {1: 6, 2: 0, 3: 0}
