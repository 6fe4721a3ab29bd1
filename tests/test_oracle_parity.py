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
