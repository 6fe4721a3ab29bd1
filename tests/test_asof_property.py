"""Property test: the broadcast-interval as-of join must agree with
pandas.merge_asof on arbitrary generated dim/probe key sets, including
exact-boundary ties and probes before the first dim key."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    dim_keys=st.sets(st.integers(0, 50), min_size=1, max_size=10),
    probe_keys=st.lists(st.integers(-5, 55), min_size=1, max_size=25),
)
def test_asof_join_matches_pandas_merge_asof(spark, dim_keys, probe_keys):
    from metrics_database_cron_script_spark.operators.asof import (
        asof_join_broadcast_dim,
    )

    dim_rows = sorted((k, float(k) * 1.5) for k in dim_keys)
    dim = spark.createDataFrame(dim_rows, "dk long, dv double")
    probe = spark.createDataFrame(
        [(i, k) for i, k in enumerate(probe_keys)], "pid long, pk long"
    )
    got = {
        (r["pid"], r["dk"], r["dv"])
        for r in asof_join_broadcast_dim(probe, dim, "pk", "dk").collect()
    }

    pdim = pd.DataFrame(dim_rows, columns=["dk", "dv"])
    pprobe = pd.DataFrame(
        {"pid": range(len(probe_keys)), "pk": probe_keys}
    ).sort_values("pk")
    merged = pd.merge_asof(pprobe, pdim, left_on="pk", right_on="dk", direction="backward")
    want = {
        (int(r.pid), None if pd.isna(r.dk) else int(r.dk), None if pd.isna(r.dv) else r.dv)
        for r in merged.itertuples()
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    dim_keys=st.sets(st.integers(0, 50), min_size=1, max_size=10),
    probe_keys=st.lists(st.integers(-5, 55), min_size=1, max_size=25),
    tol=st.integers(0, 10),
)
def test_asof_tolerance_matches_pandas(spark, dim_keys, probe_keys, tol):
    """Bounded-staleness as-of (tolerance_days) must agree with
    pandas.merge_asof(tolerance=Timedelta(days=tol)) on arbitrary date
    sets, including probes whose nearest dim row is too stale."""
    import datetime

    from metrics_database_cron_script_spark.operators.asof import (
        asof_join_broadcast_dim,
    )

    base = datetime.date(2024, 1, 1)
    d = lambda k: base + datetime.timedelta(days=k)
    dim_rows = sorted((d(k), float(k) * 1.5) for k in dim_keys)
    dim = spark.createDataFrame(dim_rows, "dk date, dv double")
    probe = spark.createDataFrame(
        [(i, d(k)) for i, k in enumerate(probe_keys)], "pid long, pk date"
    )
    got = {
        (r["pid"], r["dk"], r["dv"])
        for r in asof_join_broadcast_dim(
            probe, dim, "pk", "dk", tolerance_days=tol
        ).collect()
    }

    pdim = pd.DataFrame(dim_rows, columns=["dk", "dv"])
    pdim["dk"] = pd.to_datetime(pdim["dk"])
    pprobe = pd.DataFrame(
        {"pid": range(len(probe_keys)), "pk": [d(k) for k in probe_keys]}
    )
    pprobe["pk"] = pd.to_datetime(pprobe["pk"])
    merged = pd.merge_asof(
        pprobe.sort_values("pk"),
        pdim,
        left_on="pk",
        right_on="dk",
        direction="backward",
        tolerance=pd.Timedelta(days=tol),
    )
    want = {
        (
            int(r.pid),
            None if pd.isna(r.dk) else r.dk.date(),
            None if pd.isna(r.dv) else r.dv,
        )
        for r in merged.itertuples()
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    dim_keys=st.sets(st.integers(0, 50), min_size=1, max_size=10),
    probe_keys=st.lists(st.integers(-5, 55), min_size=1, max_size=25),
)
def test_asof_forward_matches_pandas(spark, dim_keys, probe_keys):
    """direction='forward' (least dim_key >= probe) must agree with
    pandas.merge_asof(direction='forward'), including probes after the
    last dim key (NULL)."""
    from metrics_database_cron_script_spark.operators.asof import (
        asof_join_broadcast_dim,
    )

    dim_rows = sorted((k, float(k) * 1.5) for k in dim_keys)
    dim = spark.createDataFrame(dim_rows, "dk long, dv double")
    probe = spark.createDataFrame(
        [(i, k) for i, k in enumerate(probe_keys)], "pid long, pk long"
    )
    got = {
        (r["pid"], r["dk"], r["dv"])
        for r in asof_join_broadcast_dim(
            probe, dim, "pk", "dk", direction="forward"
        ).collect()
    }

    pdim = pd.DataFrame(dim_rows, columns=["dk", "dv"])
    pprobe = pd.DataFrame(
        {"pid": range(len(probe_keys)), "pk": probe_keys}
    ).sort_values("pk")
    merged = pd.merge_asof(
        pprobe, pdim, left_on="pk", right_on="dk", direction="forward"
    )
    want = {
        (int(r.pid), None if pd.isna(r.dk) else int(r.dk), None if pd.isna(r.dv) else r.dv)
        for r in merged.itertuples()
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    dim=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=20,
        unique_by=lambda t: (t[0], t[1]),
    ),
    probe=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-5, 55)), min_size=1, max_size=25
    ),
)
def test_asof_grouped_matches_pandas_by_key(spark, dim, probe):
    """The cogrouped (non-broadcast) as-of join must agree with
    pandas.merge_asof(by=key) — including keys with an empty dim side
    (probe rows survive with NULLs) and keys only present in the dim."""
    import pandas as pd

    from metrics_database_cron_script_spark.operators.asof import asof_join_grouped

    dim_rows = [(k, v, float(v) * 2.0) for k, v in sorted(set(dim))]
    probe_rows = [(i, k, v) for i, (k, v) in enumerate(probe)]
    dim_df = spark.createDataFrame(
        dim_rows or [(99, 0, 0.0)], "by long, dk long, dv double"
    )
    if not dim_rows:
        dim_df = dim_df.filter("by < 0")  # truly empty dim
    probe_df = spark.createDataFrame(probe_rows, "pid long, by long, pk long")

    got = {
        (r["pid"], r["dv"])
        for r in asof_join_grouped(
            probe_df, dim_df, by="by", probe_key="pk", dim_key="dk"
        ).collect()
    }

    pdim = pd.DataFrame(dim_rows, columns=["by", "dk", "dv"])
    pprobe = pd.DataFrame(probe_rows, columns=["pid", "by", "pk"]).sort_values("pk")
    if pdim.empty:
        want = {(int(r.pid), None) for r in pprobe.itertuples()}
    else:
        merged = pd.merge_asof(
            pprobe,
            pdim.sort_values("dk"),
            left_on="pk",
            right_on="dk",
            by="by",
            direction="backward",
        )
        want = {
            (int(r.pid), None if pd.isna(r.dv) else r.dv) for r in merged.itertuples()
        }
    assert got == want


def test_asof_grouped_large_dim_no_broadcast_in_plan(spark):
    """At a dim ≫ probe ratio the broadcast-interval variant is illegal (the
    dim would not fit an executor); the cogrouped form must (a) carry NO
    broadcast node in the physical plan — both sides reach the merge through
    hash exchanges on the equi-key — and (b) still agree with a per-key
    pandas.merge_asof reference at that ratio (reference semantics:
    price-as-of-tx-time, updatescript.py:64-67)."""
    import pandas as pd

    from metrics_database_cron_script_spark.operators.asof import asof_join_grouped

    # 40 keys x 250 dim rows = 10k build rows vs 120 probes
    dim_rows = [
        (k, 10 * v, float(k) + v / 1000.0) for k in range(40) for v in range(250)
    ]
    probe_rows = [(i, i % 40, 10 * (i % 250) + 5) for i in range(120)]
    dim_df = spark.createDataFrame(dim_rows, "by long, dk long, dv double")
    probe_df = spark.createDataFrame(probe_rows, "pid long, by long, pk long")

    joined = asof_join_grouped(probe_df, dim_df, by="by", probe_key="pk", dim_key="dk")

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" not in plan, plan
    assert "FlatMapCoGroupsInPandas" in plan, plan

    got = {(r["pid"], r["dv"]) for r in joined.collect()}
    merged = pd.merge_asof(
        pd.DataFrame(probe_rows, columns=["pid", "by", "pk"]).sort_values("pk"),
        pd.DataFrame(dim_rows, columns=["by", "dk", "dv"]).sort_values("dk"),
        left_on="pk",
        right_on="dk",
        by="by",
        direction="backward",
    )
    want = {
        (int(r.pid), None if pd.isna(r.dv) else r.dv) for r in merged.itertuples()
    }
    assert got == want
