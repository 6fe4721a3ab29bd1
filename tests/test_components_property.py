"""Property-based check of the iterative min-label-propagation connected
components operator (functions/dedup.py) against a direct union-find on
hypothesis-generated random graphs — including multi-hop chains, cycles,
self-loops, and duplicate/reversed edges."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


edges_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edges_strategy)
def test_connected_components_matches_union_find(spark, edges):
    from metrics_database_cron_script_spark.functions.dedup import (
        connected_components,
    )

    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == union_find_components(edges)
