"""Whole-registry plan hygiene gate.

Three invariants over the physical plan of EVERY registered query, so a
future query can't silently reintroduce the classic scale-killers:

1. no `BatchEvalPython` — row-at-a-time Python UDFs are forbidden; every
   Python surface must be Arrow-batched (`ArrowEvalPython`, `mapInPandas`,
   `FlatMapGroupsInPandas`, ...);
2. no `CartesianProduct` — an unbounded non-broadcast cross product on any
   input is never the right plan at 100 TB;
3. `BroadcastNestedLoopJoin` only at ALLOWLISTED sites — BNLJ is legitimate
   exactly when one side is a broadcast scalar / tiny constant frame (corpus
   totals, thresholds, as-of interval dims); anything else must justify
   itself by joining this list with a comment.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

# Queries whose plan legitimately contains BroadcastNestedLoopJoin: every one
# broadcasts a 1-row scalar (grand totals / thresholds / corpus constants) or
# a day-cardinality interval dim (as-of), never a fact side.
BNLJ_ALLOWED = {
    "c_asof_join",            # broadcast validity-interval dim (day cardinality)
    "c_asof_tolerance",       # same, with staleness bound
    "c_chi_square",           # broadcast 1-row grand totals
    "c_cross_join",           # intended tiny cartesian: nation x region
    "c_funnel",               # broadcast 1-row step totals
    "c_rfm_segmentation",     # broadcast 1-row quantile thresholds
    "c_segment_overlap",      # broadcast 1-row segment sizes
    "c_sliding_distinct_users",  # broadcast 1-row day span
    "c_tpch_q11_shape",       # broadcast 1-row value threshold
    "c_tpch_q22_shape",       # broadcast 1-row avg acctbal
    "s_dedup_watermark",      # broadcast 1-row watermark scalar
    "s_late_data",            # broadcast 1-row watermark scalar
    "x_bigram_pmi",           # broadcast 1-row corpus totals
    "x_bm25",                 # broadcast 1-row avgdl scalar
    "x_cooccurrence_lift",    # broadcast 1-row corpus totals
    "x_drift_psi",            # broadcast 1-row split sizes
    "x_embed_ivf_topk",       # broadcast tiny centroid frame
    "x_embed_outliers",       # broadcast 1-row moment scalars
    "x_embed_sq_topk",        # broadcast 1-row quantization range
    "x_filter_cascade",       # broadcast 1-row cascade counters
    "x_mixture_weights",      # broadcast 1-row corpus size
    "x_source_kl",            # broadcast 1-row corpus totals
    "x_tfidf",                # broadcast 1-row doc count
}


def test_every_plan_is_scale_hygienic(spark):
    from metrics_database_cron_script_spark.plans import QUERIES

    row_python, cartesian, bnlj_new = [], [], []
    for name, fn in sorted(QUERIES.items()):
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            row_python.append(name)
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            bnlj_new.append(name)
    assert not row_python, f"row-at-a-time Python UDF in: {row_python}"
    assert not cartesian, f"non-broadcast cartesian in: {cartesian}"
    assert not bnlj_new, (
        f"new BroadcastNestedLoopJoin sites (justify + allowlist or replan): {bnlj_new}"
    )
