"""Property test for the Q21 de-correlation formula (queries_tpch.py):
the window/aggregate rewrite

    per (order, supp): s_max = max(shipdate)
    per order:         m1 = max(s_max), k = #supps at m1,
                       m2 = max(s_max | s_max < m1), nsupp = #supps
    other_max(supp)  = m1 if (s_max < m1 or k >= 2) else m2
    line qualifies  ⟺ nsupp >= 2 and shipdate >= other_max(supp)

must agree with the literal double-correlated EXISTS / NOT-EXISTS on every
generated line set. Domains are tiny (3 orders × 3 suppliers × 4 days) so
ties at the max — the branch that decides between m1 and m2 — occur in
most examples. Pure-Python brute force on both sides; the Spark execution
of the same formula is covered by the DuckDB oracle differential
(tests/test_oracle_parity.py, tests/test_edge_fixtures.py::test_edge_q21_tie_semantics)."""

from __future__ import annotations

from collections import Counter, defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

line_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 2), st.integers(0, 3)),
    min_size=1,
    max_size=12,
)


def _brute(lines):
    """Literal EXISTS / NOT-EXISTS per line."""
    by_order = defaultdict(list)
    for o, s, d in lines:
        by_order[o].append((s, d))
    wait = Counter()
    for o, s, d in lines:
        others = [(s2, d2) for s2, d2 in by_order[o] if s2 != s]
        if not others:  # EXISTS fails
            continue
        if any(d2 > d for _, d2 in others):  # NOT EXISTS fails
            continue
        wait[s] += 1
    return dict(wait)


def _formula(lines):
    s_max = {}
    for o, s, d in lines:
        s_max[(o, s)] = max(s_max.get((o, s), d), d)
    per_order = defaultdict(list)
    for (o, s), m in s_max.items():
        per_order[o].append(m)
    wait = Counter()
    for o, s, d in lines:
        maxes = per_order[o]
        nsupp = len(maxes)
        if nsupp < 2:
            continue
        m1 = max(maxes)
        k = sum(1 for m in maxes if m == m1)
        below = [m for m in maxes if m < m1]
        m2 = max(below) if below else None
        own = s_max[(o, s)]
        other_max = m1 if (own < m1 or k >= 2) else m2
        if other_max is not None and d >= other_max:
            wait[s] += 1
    return dict(wait)


@settings(max_examples=300, deadline=None)
@given(lines=line_strategy)
def test_q21_decorrelation_formula(lines):
    assert _formula(lines) == _brute(lines)
