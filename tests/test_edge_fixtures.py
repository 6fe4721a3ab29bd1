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
