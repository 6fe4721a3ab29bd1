"""Oracle-differential tests: every registered query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01 — see oracle.py)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _names():
    from metrics_database_cron_script_spark.plans import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, name):
    from metrics_database_cron_script_spark.oracle import check_query

    res = check_query(spark, SF_SMOKE, name)
    assert res["ok"], f"{name}: {res}"


# The exact 50-query panel the driver verifies (registry registration-order
# prefix). Frozen so a plans/ refactor that reorders registration cannot
# SILENTLY rotate which queries the driver's CORRECTNESS artifact checks —
# changing this list is a deliberate, reviewable diff.
DRIVER_PANEL = [
    "r_daily_price_dim", "r_calendar_fill", "r_incremental_scan",
    "r_tx_enrich", "r_anti_dedup", "r_first_touch", "r_aum_routing",
    "r_aum_routing_decimal", "r_stats_ratio", "r_union_chains",
    "r_upsert_snapshot", "r_upsert_evolution", "r_daily_growth",
    "r_agg_maintenance", "r_rest_price_dim_pyds", "c_scan_project",
    "c_filter", "c_case", "c_inner_join", "c_left_join", "c_semi_join",
    "c_anti_join", "c_broadcast_join", "c_range_join", "c_asof_join",
    "c_hash_agg", "c_count_distinct", "c_approx_count_distinct",
    "c_grouping_sets", "c_rollup", "c_cube", "c_window_rank",
    "c_window_analytic", "c_window_frame", "c_sort_limit",
    "c_topk_per_group", "c_union_all", "c_union_distinct", "c_intersect",
    "c_except", "c_string_funcs", "c_date_funcs", "c_math_funcs", "c_json",
    "c_map_funcs", "c_array_funcs", "c_udf_pandas", "c_pivot", "c_unpivot",
    "c_percentile",
]


def test_driver_panel_is_pinned():
    """Round-7 verdict item 7: the driver samples the registry's FIRST 50
    entries in registration order. Pin that prefix to the exact list the
    round-7 driver verified, so the verified panel can only change via an
    explicit edit to DRIVER_PANEL above."""
    from metrics_database_cron_script_spark.plans import QUERIES

    assert list(QUERIES)[:50] == DRIVER_PANEL


def test_parity_artifact_consistent_with_driver_artifact():
    """Round-6 verdict item 7: the driver's CORRECTNESS_r{N}.json samples
    only a registry prefix (all r_* + the first c_*); the committed
    PARITY_r{N}.json covers everything. This pins the two artifacts to each
    other on their overlap — same check keys (oracle.driver_format), every
    driver-sampled query still registered, and no query the driver saw
    green that our own full-parity run recorded red (or vice versa). Runs
    on the COMMITTED artifacts — no Spark — so a stale or hand-edited
    artifact fails CI, not just review."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def newest(pattern):
        paths = sorted(glob.glob(os.path.join(root, pattern)))
        return paths[-1] if paths else None

    correctness = newest("CORRECTNESS_r*.json")
    parity = newest("PARITY_r*.json")
    if correctness is None or parity is None:
        pytest.skip("driver/parity artifacts not generated yet (round 1)")
    with open(correctness) as fh:
        driver = json.load(fh)
    with open(parity) as fh:
        ours = json.load(fh)["queries"]

    from metrics_database_cron_script_spark.plans import QUERIES

    missing = sorted(set(driver) - set(QUERIES))
    assert not missing, f"driver-checked queries no longer registered: {missing}"

    # the parity artifact may lag the registry by the current round's new
    # queries (it is regenerated at round close), but never the reverse
    unknown = sorted(set(ours) - set(QUERIES))
    assert not unknown, f"parity artifact has unregistered queries: {unknown}"

    driver_keys = {"rows_match", "schema_match", "hash_match", "spark_rows",
                   "oracle_rows", "err"}
    disagreements = []
    for name in set(driver) & set(ours):
        drow = driver[name]
        assert driver_keys <= set(drow), (name, sorted(drow))
        d_ok = bool(
            drow["rows_match"] and drow["schema_match"] and drow["hash_match"]
        )
        if d_ok != bool(ours[name]["ok"]):
            disagreements.append((name, drow, ours[name]))
        if "driver" in ours[name]:
            # gen_parity emits the driver's exact shape — keys must match
            assert set(ours[name]["driver"]) == driver_keys, name
    assert not disagreements, disagreements[:5]
