"""State-machine property test for the snapshot writer: an arbitrary
sequence of keep-latest upserts must converge to the same state as a plain
Python dict applying the same version rule."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

op_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),  # key
        st.integers(0, 5),  # version
        st.integers(0, 100),  # value
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(batches=st.lists(op_strategy, min_size=1, max_size=3))
def test_snapshot_overwrite_state_machine(spark, tmp_path_factory, batches):
    from metrics_database_cron_script_spark.state import snapshot_overwrite

    path = str(tmp_path_factory.mktemp("snap") / "s.parquet")
    model: dict[str, tuple[int, int]] = {}
    for batch in batches:
        df = spark.createDataFrame(
            [(k, v, float(x)) for k, v, x in batch], "k string, ver long, val double"
        )
        snapshot_overwrite(df, path, key="k", order_cols=["ver", "val"])
        # model: keep-latest by (ver, val) desc per key, across batches
        for k, v, x in batch:
            cur = model.get(k)
            if cur is None or (v, x) > cur:
                model[k] = (v, x)
        got = {
            r["k"]: (r["ver"], int(r["val"]))
            for r in spark.read.parquet(path).collect()
        }
        assert got == model


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    appends=st.lists(
        st.tuples(
            st.integers(1, 40),   # rows in this append
            st.integers(1, 6),    # files it is spread across
        ),
        min_size=1,
        max_size=4,
    ),
    target_mb=st.sampled_from([1, 64]),
)
def test_compact_property_content_and_fixpoint(
    spark, tmp_path_factory, appends, target_mb
):
    """For ANY append history and target: compaction preserves row content
    exactly, never increases the file count, and is a fixpoint — a second
    immediate run changes nothing (names, sizes, inodes)."""
    import os

    from metrics_database_cron_script_spark.operators.maintenance import (
        compact,
        parquet_file_count,
    )

    path = str(tmp_path_factory.mktemp("cprop") / "sink")
    base = 0
    for rows, nfiles in appends:
        spark.range(base, base + rows).repartition(nfiles).write.mode(
            "append"
        ).parquet(path)
        base += rows
    spark.catalog.refreshByPath(path)
    want = sorted(r["id"] for r in spark.read.parquet(path).collect())
    n0 = parquet_file_count(path)

    n1 = compact(spark, path, target_mb=target_mb)
    spark.catalog.refreshByPath(path)
    assert n1 <= n0
    assert sorted(r["id"] for r in spark.read.parquet(path).collect()) == want

    def snap():
        return sorted(
            (f, os.path.getsize(os.path.join(path, f)),
             os.stat(os.path.join(path, f)).st_ino)
            for f in os.listdir(path) if f.endswith(".parquet")
        )

    before = snap()
    n2 = compact(spark, path, target_mb=target_mb)
    assert n2 == n1
    assert snap() == before
