"""Unit tests for round-6 primitives: size-carry through LSH banding,
constant-dim literal inlining, and the verified-star precision guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_carried_sizes_equal_derived_sizes(spark):
    """verified_jaccard's CARRIED path (sz_a/sz_b threaded through the
    banding join) must emit exactly the DERIVED path's triples — the
    xxhash64 fast path has no SQL oracle, so the equivalence of the two
    size plumbing routes is pinned here."""
    from metrics_database_cron_script_spark.functions import dedup as D
    from metrics_database_cron_script_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    sh = D.word_shingles(docs).persist()
    sigs = D.minhash_signatures(sh, 8, with_size=True)
    carried_pairs = D.lsh_candidate_pairs(sigs, 2, 8, carry=("sz",))
    derived_pairs = carried_pairs.select("doc_a", "doc_b")
    carried = {
        tuple(r) for r in D.verified_jaccard(sh, carried_pairs).collect()
    }
    derived = {
        tuple(r) for r in D.verified_jaccard(sh, derived_pairs).collect()
    }
    sh.unpersist()
    assert carried == derived and len(carried) > 0


def test_constant_dim_guard_refuses_growing_tables():
    from metrics_database_cron_script_spark.sources.tables import (
        constant_dim_rows,
    )

    with pytest.raises(ValueError, match="constant-cardinality"):
        constant_dim_rows(SF_SMOKE, "customer")


def test_inline_dim_map_matches_broadcast_join(spark):
    """The literal-map lookup must reproduce the inner join it replaces —
    per (nationkey → n_name) pair and in dropped-row behavior."""
    from metrics_database_cron_script_spark.sources import load_table
    from metrics_database_cron_script_spark.sources.tables import (
        inline_dim_map,
    )

    c = load_table(spark, SF_SMOKE, "customer")
    n = load_table(spark, SF_SMOKE, "nation")
    joined = {
        tuple(r)
        for r in c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .select("c_custkey", "n_name")
        .collect()
    }
    m = inline_dim_map(SF_SMOKE, "nation", "n_nationkey", "n_name")
    inlined = {
        tuple(r)
        for r in c.withColumn("n_name", F.element_at(m, F.col("c_nationkey")))
        .filter(F.col("n_name").isNotNull())
        .select("c_custkey", "n_name")
        .collect()
    }
    assert inlined == joined and len(inlined) > 0


def test_verified_star_components_never_coarser_than_unverified(spark):
    """Verification only REMOVES edges, so every verified component must
    be a subset of one unverified component (refinement), never a merge."""
    from metrics_database_cron_script_spark.functions import dedup as D
    from metrics_database_cron_script_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    sh = D.word_shingles(docs, hashed=False).persist()
    star = {
        r["doc_id"]: r["component"]
        for r in D.minhash_components_star(docs, shingles=sh).collect()
    }
    verified = {
        r["doc_id"]: r["component"]
        for r in D.minhash_components_verified(docs, shingles=sh).collect()
    }
    sh.unpersist()
    # refinement: two docs in the same VERIFIED cluster must share an
    # unverified cluster (the reverse need not hold)
    by_vcomp: dict[int, set[int]] = {}
    for doc, comp in verified.items():
        by_vcomp.setdefault(comp, set()).add(doc)
    for members in by_vcomp.values():
        ucomps = {star[d] for d in members if d in star}
        assert len(ucomps) <= 1
