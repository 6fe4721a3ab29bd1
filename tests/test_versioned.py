"""Optimistic-concurrency snapshot table (versioned.py): commit protocol,
conflict detection, retry convergence, crash orphans, vacuum."""

from __future__ import annotations

import os

import pytest

from metrics_database_cron_script_spark.versioned import (
    ConcurrentWriteError,
    VersionedSnapshot,
)

SCHEMA = "user_id long, ts timestamp, value double"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted((r["user_id"], str(r["ts"]), r["value"]) for r in df.collect())


def test_versions_bump_and_read_latest(spark, tmp_path):
    import datetime as dt

    t = VersionedSnapshot(spark, str(tmp_path / "snap"))
    assert t.version() == -1
    assert t.read(SCHEMA).count() == 0  # bootstrap

    v1 = t.overwrite(_df(spark, [(1, dt.datetime(2024, 1, 1), 10.0)]))
    assert v1 == 0 and t.version() == 0
    v2 = t.overwrite(_df(spark, [(1, dt.datetime(2024, 1, 2), 20.0)]))
    assert v2 == 1
    assert _rows(t.read()) == [(1, "2024-01-02 00:00:00", 20.0)]


def test_stale_expected_version_raises(spark, tmp_path):
    import datetime as dt

    t = VersionedSnapshot(spark, str(tmp_path / "snap"))
    base = t.version()  # -1
    t.overwrite(_df(spark, [(1, dt.datetime(2024, 1, 1), 1.0)]))  # someone commits
    with pytest.raises(ConcurrentWriteError):
        t.overwrite(_df(spark, [(2, dt.datetime(2024, 1, 1), 2.0)]), expected_version=base)
    # unconditional commit still works and the loser's data did not land
    assert t.read().count() == 1


def test_lost_race_on_marker_is_detected_and_stage_cleaned(spark, tmp_path):
    """Simulate the narrowest race: both writers observed v, writer A creates
    the marker first (simulated by pre-creating it), writer B must raise on
    its exclusive-create and remove its staged data dir."""
    import datetime as dt

    t = VersionedSnapshot(spark, str(tmp_path / "snap"))
    t.overwrite(_df(spark, [(1, dt.datetime(2024, 1, 1), 1.0)]))  # v0
    v = t.version()

    # interpose: stage B's data first (as overwrite would), then let A win
    class Racer(VersionedSnapshot):
        def _marker(self, version):
            m = super()._marker(version)
            if version == v + 1 and not os.path.exists(m):
                # writer A sneaks in right before B's exclusive create
                os.makedirs(os.path.dirname(m), exist_ok=True)
                with open(m, "x"):
                    pass
            return m

    b = Racer(spark, str(tmp_path / "snap"))
    with pytest.raises(ConcurrentWriteError):
        b.overwrite(_df(spark, [(9, dt.datetime(2024, 2, 1), 9.0)]), expected_version=v)
    # B's staged dir was cleaned up (no orphan for the committed slot)
    assert not os.path.isdir(b._data_dir(v + 1)) or t.version() == v + 1


def test_merge_keep_latest_retries_and_loses_no_update(spark, tmp_path):
    """Writer B's read-modify-write races a sneaky writer A committing midway:
    B must retry on the conflict and the final snapshot must contain BOTH
    updates (no lost update — the failure mode plain snapshot_overwrite has
    under concurrency)."""
    import datetime as dt

    path = str(tmp_path / "snap")
    t = VersionedSnapshot(spark, path)
    t.merge_keep_latest(
        _df(spark, [(1, dt.datetime(2024, 1, 1), 1.0)]), key="user_id", order_cols=["ts"]
    )

    fired = {"done": False}

    class SneakyRace(VersionedSnapshot):
        """First overwrite attempt is preempted by writer A committing user 2."""

        def overwrite(self, df, expected_version=None):
            if not fired["done"]:
                fired["done"] = True
                VersionedSnapshot(self.spark, self.path).merge_keep_latest(
                    _df(self.spark, [(2, dt.datetime(2024, 1, 5), 5.0)]),
                    key="user_id",
                    order_cols=["ts"],
                )
            return super().overwrite(df, expected_version)

    b = SneakyRace(spark, path)
    b.merge_keep_latest(
        _df(spark, [(1, dt.datetime(2024, 1, 3), 3.0)]), key="user_id", order_cols=["ts"]
    )
    assert fired["done"]
    assert _rows(t.read()) == [
        (1, "2024-01-03 00:00:00", 3.0),  # B's update survived the retry
        (2, "2024-01-05 00:00:00", 5.0),  # A's interleaved update not lost
    ]


def test_orphan_stage_invisible_and_vacuumed(spark, tmp_path):
    """A crash between data write and marker create leaves an orphan dir:
    readers must not see it; vacuum must reap it (and superseded versions)."""
    import datetime as dt

    t = VersionedSnapshot(spark, str(tmp_path / "snap"))
    for day, val in [(1, 1.0), (2, 2.0), (3, 3.0)]:
        t.overwrite(_df(spark, [(1, dt.datetime(2024, 1, day), val)]))
    # simulate a crashed writer: staged data for v3, no marker
    _df(spark, [(7, dt.datetime(2024, 9, 9), 7.0)]).write.parquet(t._data_dir(3))
    assert t.version() == 2
    assert _rows(t.read()) == [(1, "2024-01-03 00:00:00", 3.0)]

    removed = t.vacuum(keep=1)
    assert t._data_dir(3) in removed  # orphan reaped
    assert t._data_dir(0) in removed and t._data_dir(1) in removed  # superseded
    assert os.path.isdir(t._data_dir(2))  # current retained
    assert _rows(t.read()) == [(1, "2024-01-03 00:00:00", 3.0)]

    # next commit after vacuum continues the version sequence
    v = t.overwrite(_df(spark, [(1, dt.datetime(2024, 1, 9), 9.0)]))
    assert v == 3 and t.version() == 3


def test_time_travel_and_history(spark, tmp_path):
    """read(version=k) returns the exact historical snapshot while it is
    retained; vacuumed versions raise instead of silently redirecting."""
    import datetime as dt



    t = VersionedSnapshot(spark, str(tmp_path / "snap"))
    for day, val in [(1, 1.0), (2, 2.0), (3, 3.0)]:
        t.overwrite(_df(spark, [(1, dt.datetime(2024, 1, day), val)]))
    assert t.history() == [0, 1, 2]

    assert _rows(t.read(version=0)) == [(1, "2024-01-01 00:00:00", 1.0)]
    assert _rows(t.read(version=1)) == [(1, "2024-01-02 00:00:00", 2.0)]
    assert _rows(t.read()) == [(1, "2024-01-03 00:00:00", 3.0)]

    with pytest.raises(FileNotFoundError, match="no committed version 9"):
        t.read(version=9)

    t.vacuum(keep=1)
    assert t.history() == [0, 1, 2]  # the log is permanent; data dirs are not
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        t.read(version=0)
    assert _rows(t.read(version=2)) == [(1, "2024-01-03 00:00:00", 3.0)]
