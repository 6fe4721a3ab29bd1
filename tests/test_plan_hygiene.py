"""Whole-registry plan hygiene gate.

Three invariants over the physical plan of EVERY registered query, so a
future query can't silently reintroduce the classic scale-killers:

1. no `BatchEvalPython` — row-at-a-time Python UDFs are forbidden; every
   Python surface must be Arrow-batched (`ArrowEvalPython`, `mapInPandas`,
   `FlatMapGroupsInPandas`, ...);
2. no `CartesianProduct` — an unbounded non-broadcast cross product on any
   input is never the right plan at 100 TB;
3. `BroadcastNestedLoopJoin` only at ALLOWLISTED sites, with the EXACT
   occurrence count pinned per query — BNLJ is legitimate exactly when one
   side is a broadcast scalar / tiny constant frame (corpus totals,
   thresholds, as-of interval dims). Pinning the count (not just membership)
   means an allowlisted query growing a second, fact-sided BNLJ fails, and
   one that loses its legitimate BNLJ flags allowlist rot instead of
   pre-authorizing future regressions.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE

# query -> exact number of legitimate BroadcastNestedLoopJoin sites: each is
# a 1-row scalar broadcast (grand totals / thresholds / corpus constants), a
# day-cardinality as-of interval dim, or the intended tiny cartesian.
BNLJ_ALLOWED = {
    "c_asof_join": 1,            # broadcast validity-interval dim (day cardinality)
    "c_asof_tolerance": 1,       # same, with staleness bound
    "c_chi_square": 1,           # broadcast 1-row grand totals
    "c_cross_join": 1,           # intended tiny cartesian: nation x region
    "c_funnel": 2,               # broadcast 1-row step totals, two stages
    "c_graph_pagerank": 4,       # broadcast 1-row node count: init + 3 unrolled iterations
    "c_rfm_segmentation": 1,     # broadcast 1-row quantile thresholds
    "c_segment_overlap": 2,      # broadcast 1-row sizes for two segments
    "c_sliding_distinct_users": 1,  # broadcast 1-row day span
    "c_tpch_q11_shape": 1,       # broadcast 1-row value threshold
    "c_tpch_q22_shape": 1,       # broadcast 1-row avg acctbal
    "s_dedup_watermark": 1,      # broadcast 1-row watermark scalar
    "s_late_data": 1,            # broadcast 1-row watermark scalar
    "x_bigram_pmi": 2,           # broadcast 1-row corpus totals, two passes
    "x_bm25": 1,                 # broadcast 1-row avgdl scalar
    "x_cooccurrence_lift": 1,    # broadcast 1-row corpus totals
    "x_drift_psi": 1,            # broadcast 1-row split sizes
    "x_embed_ivf_topk": 1,       # broadcast tiny centroid frame
    "x_embed_outliers": 1,       # broadcast 1-row moment scalars
    "x_embed_sq_topk": 1,        # broadcast 1-row quantization range
    "x_filter_cascade": 1,       # broadcast 1-row cascade counters
    "x_mixture_weights": 1,      # broadcast 1-row corpus size
    "x_source_kl": 1,            # broadcast 1-row corpus totals
    "x_tfidf": 1,                # broadcast 1-row doc count
}


def test_every_plan_is_scale_hygienic(spark):
    from metrics_database_cron_script_spark.plans import QUERIES

    row_python, cartesian, bnlj_wrong = [], [], []
    for name, fn in sorted(QUERIES.items()):
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            row_python.append(name)
        if "CartesianProduct" in plan:
            cartesian.append(name)
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        if n_bnlj != BNLJ_ALLOWED.get(name, 0):
            bnlj_wrong.append((name, n_bnlj, BNLJ_ALLOWED.get(name, 0)))
    assert not row_python, f"row-at-a-time Python UDF in: {row_python}"
    assert not cartesian, f"non-broadcast cartesian in: {cartesian}"
    assert not bnlj_wrong, (
        "BroadcastNestedLoopJoin count drift (name, found, pinned) — justify "
        f"a new site or prune allowlist rot: {bnlj_wrong}"
    )
