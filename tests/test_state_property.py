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
