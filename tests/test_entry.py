"""Driver-contract smoke: entry() runs, returns rows, and its schema is
stable across invocations (the driver's own check)."""

from __future__ import annotations


def test_entry_runs_and_is_stable(spark):
    import __spark_entry__ as e

    df1 = e.entry(spark)
    df2 = e.entry(spark)
    assert df1.count() == df2.count() > 0
    assert df1.schema == df2.schema


def test_every_query_has_unique_registration():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 90
