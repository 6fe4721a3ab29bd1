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
