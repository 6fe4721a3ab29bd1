"""Invariants of the greedy sequence-packing operator (functions/text.py)
and the overlapping RAG chunker — checked on the sf0.001 fixture, on top of
the driver's value-hash oracle (tests assert STRUCTURAL properties the hash
cannot see: budget respect, contiguity, monotonicity, coverage)."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_SMOKE

BUDGET = 128


def test_seq_packing_invariants(spark):
    from metrics_database_cron_script_spark.functions.text import sequence_packing
    from metrics_database_cron_script_spark.sources import load_table

    rows = sequence_packing(
        load_table(spark, SF_SMOKE, "documents"), budget=BUDGET
    ).collect()
    by_source = defaultdict(list)
    for r in rows:
        by_source[r.source].append(r)

    assert by_source, "packing produced no rows"
    for source, rs in by_source.items():
        rs.sort(key=lambda r: r.doc_id)
        # seq ids start at 0, are contiguous, and never decrease in doc order
        seqs = [r.seq_id for r in rs]
        assert seqs[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(seqs, seqs[1:])), source
        # each sequence respects the budget unless it is a single oversized doc
        totals = defaultdict(int)
        counts = defaultdict(int)
        for r in rs:
            totals[r.seq_id] += r.n_tok
            counts[r.seq_id] += 1
        for seq, total in totals.items():
            assert total <= BUDGET or counts[seq] == 1, (source, seq, total)
        # greedy tightness: a sequence boundary only happens on overflow —
        # the first doc of seq s+1 cannot fit into seq s
        first_of = {}
        for r in rs:
            first_of.setdefault(r.seq_id, r.n_tok)
        for seq in sorted(totals)[:-1]:
            assert totals[seq] + first_of[seq + 1] > BUDGET, (source, seq)


def test_rag_chunks_cover_every_token(spark):
    from metrics_database_cron_script_spark.plans.registry import QUERIES
    from metrics_database_cron_script_spark.sources import load_table
    from pyspark.sql import functions as F

    chunks = QUERIES["x_rag_chunks"](spark, SF_SMOKE).collect()
    n_tok = {
        r.doc_id: r.n
        for r in load_table(spark, SF_SMOKE, "documents")
        .select(
            "doc_id",
            F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n"),
        )
        .collect()
    }
    by_doc = defaultdict(list)
    for c in chunks:
        by_doc[c.doc_id].append(c)
    assert set(by_doc) == set(n_tok)
    for doc_id, cs in by_doc.items():
        cs.sort(key=lambda c: c.chunk_id)
        # stride-16 starts; last chunk reaches the end of the doc
        assert [c.start_tok for c in cs] == [i * 16 + 1 for i in range(len(cs))]
        last = cs[-1]
        assert last.start_tok - 1 + last.n_tok == max(n_tok[doc_id], 0) or (
            n_tok[doc_id] == 0 and last.n_tok <= 0
        )
        # every chunk except the tail is full-width-or-clipped-by-doc
        for c in cs[:-1]:
            assert c.n_tok == min(32, n_tok[doc_id] - (c.start_tok - 1))
