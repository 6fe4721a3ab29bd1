"""MinHash band auto-tuner: S-curve math, the chosen engine default, and a
measured-recall check on a planted corpus — the chooser must not just
predict recall, the banding it picks has to deliver it on real shingles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metrics_database_cron_script_spark.functions.dedup import (
    MINHASH_DEFAULTS,
    choose_minhash_params,
    lsh_collision_prob,
    minhash_near_dups_portable,
    word_shingles,
)


def test_s_curve_monotonic_and_bounded():
    ps = [lsh_collision_prob(s / 10, 2, 4) for s in range(11)]
    assert ps[0] == 0.0 and ps[-1] == 1.0
    assert all(a <= b for a, b in zip(ps, ps[1:]))


def test_chooser_meets_both_constraints():
    p = choose_minhash_params(0.8, 0.98, 0.4, 0.55)
    assert p.recall_at_threshold >= 0.98 and p.fp_at_low <= 0.55
    assert p.num_hashes == p.band_size * p.n_bands
    # cheapest: no feasible banding with fewer hashes exists
    for n in range(2, p.num_hashes):
        for r in range(1, n + 1):
            if n % r or n // r < 2:
                continue
            assert not (
                lsh_collision_prob(0.8, r, n // r) >= 0.98
                and lsh_collision_prob(0.4, r, n // r) <= 0.55
            )


def test_engine_default_is_chooser_output():
    """MINHASH_DEFAULTS is derived, not hand-picked — and resolves to the
    8-hash / 4×2-band scheme every portable oracle CTE encodes."""
    assert MINHASH_DEFAULTS == choose_minhash_params()
    assert (MINHASH_DEFAULTS.num_hashes, MINHASH_DEFAULTS.band_size) == (8, 2)


def test_chooser_raises_when_infeasible():
    with pytest.raises(ValueError, match="no \\(band_size"):
        # recall 0.999 at s=0.5 with fp ≤ 0.01 at s=0.25 within 8 hashes:
        # the S-curve cannot be that steep that cheaply
        choose_minhash_params(0.5, 0.999, 0.25, 0.01, max_hashes=8)


def test_tuning_query_chosen_row_is_default(spark):
    from metrics_database_cron_script_spark.plans.registry import QUERIES

    rows = QUERIES["x_minhash_tuning"](spark, "/root/testdata/sf0.001").collect()
    chosen = [r for r in rows if r["chosen"]]
    assert len(chosen) == 1
    assert chosen[0]["band_size"] == MINHASH_DEFAULTS.band_size
    assert chosen[0]["n_bands"] == MINHASH_DEFAULTS.n_bands
    assert chosen[0]["num_hashes"] == MINHASH_DEFAULTS.num_hashes
    assert all(r["feasible"] for r in chosen)


def test_chosen_params_hit_measured_recall(spark):
    """Plant 30 twin pairs with true word-shingle Jaccard ≥ 0.8 and measure
    the banding the chooser picked: recall must reach the 0.98 target less
    one pair of slack (outcomes are deterministic — md5 banding on fixed
    text — so this is a pinned measurement, not a flaky sample)."""
    base_words = [f"w{i}x" for i in range(40)]
    docs = []
    for d in range(30):
        words = [f"{w}d{d}" for w in base_words]
        docs.append((d, " ".join(words)))
        twin = list(words)
        twin[7] = "zz"  # one word of 40 → jaccard ≈ (38-3)/(38+3) ≈ 0.85
        docs.append((1000 + d, " ".join(twin)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # exact truth: shingle-join Jaccard ≥ 0.8 (same rule as x_minhash_recall)
    sh = word_shingles(df, hashed=False).persist()
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sa.join(sb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")),
            "doc_b",
        )
        .filter(F.col("n") / (F.col("sza") + F.col("szb") - F.col("n")) >= 0.8)
        .collect()
    }
    assert len(truth) == 30  # every twin pair qualifies, nothing else

    cand = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_near_dups_portable(df, shingles=sh, verify=False).collect()
    }
    recall = len(truth & cand) / len(truth)
    assert recall >= MINHASH_DEFAULTS.recall_at_threshold - 1 / len(truth), (
        recall,
        MINHASH_DEFAULTS.recall_at_threshold,
    )
    sh.unpersist()


def test_star_components_equal_clique_components(spark):
    """star_edges collapse: components over per-bucket star edges must
    equal components over the full posting self-join cliques."""
    from metrics_database_cron_script_spark.functions.dedup import (
        connected_components,
        shingle_components_star,
        shingle_edges,
    )
    from metrics_database_cron_script_spark.sources import load_table

    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    clique = {
        (r["doc_id"], r["component"])
        for r in connected_components(shingle_edges(docs, n=8)).collect()
    }
    star = {
        (r["doc_id"], r["component"])
        for r in shingle_components_star(docs, n=8).collect()
    }
    assert star == clique and len(star) > 0


def test_connected_components_long_chain_converges_log_rounds(spark):
    """Path halving: a 2 000-node path graph (diameter 2 000) must converge
    within an explicit 20-round cap (default is 50) — plain min-label
    propagation would
    need ~2 000 rounds (this is the SFXL failure mode: LSH buckets chain
    duplicate clusters into long paths)."""
    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.functions.dedup import (
        connected_components,
    )

    edges = spark.range(1999).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    comps = connected_components(edges, max_iterations=20)
    rows = comps.collect()
    assert len(rows) == 2000
    assert {r["component"] for r in rows} == {0}
