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
    "c_graph_triangles": 2,      # broadcast 1-row node/edge/triangle counts joined
    "c_histogram_quantile_merge": 4,  # 1-row bounds frame (x2: merged+direct
    #   consumers each re-instantiate it), 3-row quantile literals, 1-row
    #   merged==direct equality bit — all bounded-cardinality by construction
    "c_hll_daily_merge": 1,      # broadcast 1-row direct-estimate frame
    "c_rfm_segmentation": 1,     # broadcast 1-row quantile thresholds
    "c_segment_overlap": 2,      # broadcast 1-row sizes for two segments
    "c_sliding_distinct_users": 1,  # broadcast 1-row day span
    "c_tpch_q11_shape": 1,       # broadcast 1-row value threshold
    "c_tpch_q22_shape": 1,       # broadcast 1-row avg acctbal
    "s_dedup_watermark": 1,      # broadcast 1-row watermark scalar
    "s_late_data": 1,            # broadcast 1-row watermark scalar
    "x_ann_recall": 1,           # broadcast 1-row hit-count frame
    "x_bigram_pmi": 2,           # broadcast 1-row corpus totals, two passes
    "x_bm25": 1,                 # broadcast 1-row avgdl scalar
    "x_cooccurrence_lift": 1,    # broadcast 1-row corpus totals
    "x_drift_psi": 1,            # broadcast 1-row split sizes
    "x_embed_outliers": 1,       # broadcast 1-row moment scalars
    "x_embed_pq_topk": 1,        # broadcast constant probe sample x corpus codes
    "x_embed_sq_topk": 1,        # broadcast 1-row quantization range
    "x_filter_cascade": 1,       # broadcast 1-row cascade counters
    "x_mixture_weights": 1,      # broadcast 1-row corpus size
    "x_source_kl": 1,            # broadcast 1-row corpus totals
    "x_tfidf": 1,                # broadcast 1-row doc count
}


# query -> exact number of legitimate broadcast build sides whose subtree
# SCANS a scale-growing table (customer/supplier/part/orders/lineitem/
# events/documents/embeddings). Measured with the auto-broadcast threshold
# DISABLED, so only explicit `F.broadcast` hints (and Spark's own
# broadcast-only operators) appear — i.e. this pins every site where the
# PLAN ITSELF asserts the build side stays small regardless of scale
# factor. Each entry must reduce the growing input to bounded cardinality
# before the exchange: a global (keys=[]) aggregate, a per-event-type /
# per-day frame, a top-K limit, or a constant probe sample. A raw growing
# scan under a hinted broadcast is ALWAYS a violation (that's the
# fixture-tuned-hint class that OOMs at 100×) — except the null-aware anti
# join, which Spark can only execute broadcast-side.
BROADCAST_GROWING_ALLOWED = {
    "c_asof_join": 1,            # day-cardinality validity-interval dim over events
    "c_asof_tolerance": 1,       # same day-cardinality interval dim
    "c_chi_square": 3,           # 1-row grand total + per-type/per-bucket marginals
    "c_mad": 1,                  # per-event-type median frame (bounded type set)
    "c_not_in_subquery": 1,      # NOT IN = null-aware anti join: Spark executes
                                 # NAAJ only as a broadcast; the scalable rewrite
                                 # is an explicit left_anti (c_anti_join)
    "c_rfm_segmentation": 1,     # 1-row quantile thresholds
    "c_sliding_distinct_users": 1,  # 1-row day-span scalar
    "c_tpch_q15_shape": 1,       # 1-row max(total_revenue) scalar
    "c_tpch_q22_shape": 1,       # 1-row avg(acctbal) scalar
    "c_udf_pandas": 1,           # 1-row normalization moments
    "r_tx_enrich": 1,            # daily price dim: one row per calendar day
    "s_dedup_watermark": 1,      # 1-row watermark scalar
    "s_late_data": 1,            # 1-row watermark scalar
    "x_bm25": 2,                 # 1-row avgdl + bounded-K document-frequency vocab
    "x_cooccurrence_lift": 2,    # per-event-type totals + 1-row corpus total
    "x_decontaminate": 1,        # benchmark contamination set: fixed eval suite
    "x_drift_psi": 1,            # 1-row split sizes
    "x_embed_lsh_topk": 1,       # constant-size probe sample
    "x_embed_outliers": 1,       # 1-row moment scalars
    "x_ann_recall": 1,           # constant-size probe sample via the LSH sub-plan
    "x_embed_pq_topk": 2,        # constant-size probe sample: ADC proxy pass
                                 # + the shortlist's exact re-rank join
    "x_embed_sq_topk": 1,        # constant-size probe sample
    "x_filter_cascade": 1,       # 1-row cascade counters
    "x_mixture_weights": 2,      # per-source totals (bounded source set) ×2
    "x_standardize": 1,          # per-event-type moments
    "x_stopword_prune": 1,       # top-K stopword vocabulary
    "x_tfidf": 1,                # 1-row doc count
    "x_vocab_coverage": 1,       # top-K vocabulary
    "x_winsorize": 1,            # per-event-type quantile bounds
}

GROWING_TABLES = {
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
}


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _subtree(node):
    stack = [node]
    while stack:
        x = stack.pop()
        yield x
        stack.extend(_children(x))


def _scan_tables(root):
    out = set()
    for x in _subtree(root):
        if x.getClass().getSimpleName() in (
            "FileSourceScanExec", "RowDataSourceScanExec"
        ):
            paths = x.relation().location().rootPaths()
            for i in range(paths.size()):
                p = paths.apply(i).toString()
                out.add(p.rstrip("/").split("/")[-1].replace(".parquet", ""))
    return out


def test_no_unbounded_broadcast_build_sides(spark):
    """With auto-broadcast disabled, walk every query's physical plan and
    count broadcast exchanges whose build subtree scans a scale-growing
    table; the count must match the justified pin above. This is the gate
    that keeps the fixture-tuned-hint class (pinned F.broadcast on
    customer/supplier/part-sized relations — drives the driver toward OOM
    at 100× instead of degrading to a shuffle join) from regrowing: a raw
    growing-table scan under a hinted broadcast can never pass, and a new
    bounded-aggregate site must be added here with its boundedness
    justified."""
    from metrics_database_cron_script_spark.plans import QUERIES
    from metrics_database_cron_script_spark.plans.registry import clear_plan_cache

    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    clear_plan_cache()
    spark.conf.set(key, "-1")
    wrong, raw = [], []
    try:
        for name, fn in sorted(QUERIES.items()):
            plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan()
            n_growing = 0
            for node in _subtree(plan):
                if node.getClass().getSimpleName() != "BroadcastExchangeExec":
                    continue
                for child in _children(node):
                    growing = _scan_tables(child) & GROWING_TABLES
                    if not growing:
                        continue
                    n_growing += 1
                    bounded = name == "c_not_in_subquery" or any(
                        y.getClass().getSimpleName()
                        in (
                            "HashAggregateExec",
                            "SortAggregateExec",
                            "ObjectHashAggregateExec",
                            "WindowExec",
                            "GlobalLimitExec",
                            "CollectLimitExec",
                            "FilterExec",  # constant probe-sample filters
                        )
                        for y in _subtree(child)
                    )
                    if not bounded:
                        raw.append((name, sorted(growing)))
            if n_growing != BROADCAST_GROWING_ALLOWED.get(name, 0):
                wrong.append(
                    (name, n_growing, BROADCAST_GROWING_ALLOWED.get(name, 0))
                )
    finally:
        spark.conf.set(key, old)
        clear_plan_cache()
    assert not raw, f"raw growing-table scan under a hinted broadcast: {raw}"
    assert not wrong, (
        "growing-table broadcast build-side drift (name, found, pinned) — "
        f"justify the new site above or prune allowlist rot: {wrong}"
    )


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
