"""Tests for the bench-layout presplit rewrite and the registry plan cache."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


def _write_fixture(dirpath, name, n_rows):
    os.makedirs(dirpath, exist_ok=True)
    tbl = pa.table(
        {"r_regionkey": pa.array(range(n_rows), pa.int32()),
         "r_name": pa.array([f"R{i}" for i in range(n_rows)])}
    )
    pq.write_table(tbl, os.path.join(dirpath, f"{name}.parquet"))


def test_presplit_preserves_rows_schema_and_is_idempotent(tmp_path):
    from metrics_database_cron_script_spark.sources.presplit import presplit

    src = str(tmp_path / "src")
    _write_fixture(src, "region", 1000)
    dst = presplit(src, str(tmp_path / "dst"), target_file_bytes=2048, max_files=8)

    files = sorted(glob.glob(f"{dst}/region.parquet/*.parquet"))
    assert len(files) >= 2  # actually split
    got = pa.concat_tables([pq.read_table(f) for f in files])
    want = pq.read_table(f"{src}/region.parquet")
    assert got.num_rows == want.num_rows
    assert got.schema.equals(want.schema)
    assert sorted(got.column("r_regionkey").to_pylist()) == list(range(1000))

    # idempotent: marker short-circuits (mtimes of outputs unchanged)
    before = {f: os.path.getmtime(f) for f in files}
    presplit(src, dst, target_file_bytes=2048, max_files=8)
    assert {f: os.path.getmtime(f) for f in files} == before

    # source rewrite invalidates the marker → rebuild picks up new rows
    _write_fixture(src, "region", 500)
    os.utime(f"{src}/region.parquet", (1, 1))  # force distinct fingerprint
    dst2 = presplit(src, dst, target_file_bytes=2048, max_files=8)
    files2 = sorted(glob.glob(f"{dst2}/region.parquet/*.parquet"))
    got2 = pa.concat_tables([pq.read_table(f) for f in files2])
    assert got2.num_rows == 500


def test_duckdb_oracle_reads_presplit_directory_layout(tmp_path):
    from metrics_database_cron_script_spark.oracle import duckdb_connect
    from metrics_database_cron_script_spark.sources.presplit import presplit

    dst = presplit(SF_SMOKE, str(tmp_path / "ps"), target_file_bytes=4096)
    con = duckdb_connect(dst)
    raw = duckdb_connect(SF_SMOKE)
    for t in ("region", "lineitem", "events"):
        n_split = con.execute(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
        n_raw = raw.execute(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
        assert n_split == n_raw


def test_plan_cache_reuses_and_clears(spark):
    from metrics_database_cron_script_spark.plans import QUERIES
    from metrics_database_cron_script_spark.plans.registry import clear_plan_cache

    df1 = QUERIES["c_filter"](spark, SF_SMOKE)
    df2 = QUERIES["c_filter"](spark, SF_SMOKE)
    assert df1 is df2  # same logical plan object, zero rebuild cost
    # distinct per sf_dir key
    assert QUERIES["c_filter"](spark, SF_SMOKE + "/") is df1  # rstrip-normalized
    clear_plan_cache()
    df3 = QUERIES["c_filter"](spark, SF_SMOKE)
    assert df3 is not df1
    assert df3.count() == df1.count()


def test_load_table_cache_invalidation(spark, tmp_path):
    """invalidate_caches drops the frozen file listing AND the registry's
    cached query plans, so an in-place fixture rewrite is actually
    re-resolved — the stale-read failure mode both caches exist to avoid."""
    import shutil

    from metrics_database_cron_script_spark.plans import QUERIES
    from metrics_database_cron_script_spark.sources.tables import (
        invalidate_caches,
        load_table,
    )

    d = str(tmp_path / "fx")
    os.makedirs(d)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", f"{d}/{t}.parquet")
    n1 = load_table(spark, d, "lineitem").count()
    q1 = QUERIES["c_scan_project"](spark, d).count()  # scans lineitem
    assert n1 > 0 and q1 == n1

    # REWRITE the lineitem table in place with half the rows
    src = pq.read_table(f"{SF_SMOKE}/lineitem.parquet")
    half = src.slice(0, src.num_rows // 2)
    pq.write_table(half, f"{d}/lineitem.parquet")

    invalidate_caches(d)
    n2 = load_table(spark, d, "lineitem").count()
    assert n2 == half.num_rows != n1
    # the registered query over the same dir must also see the rewrite
    # (plan cache purged alongside the catalog cache)
    q2 = QUERIES["c_scan_project"](spark, d).count()
    assert q2 != q1


def test_presplit_mirrors_directory_shaped_source(spark, tmp_path):
    """Regression: a fixture dir where one table is ALREADY a multi-file
    directory must carry that table into the bench copy (hardlinked), not
    silently drop it while reporting success."""
    import os
    import shutil

    from metrics_database_cron_script_spark.sources.presplit import presplit
    from metrics_database_cron_script_spark.sources.tables import TABLES

    src = str(tmp_path / "src")
    os.makedirs(src)
    # copy the single-file fixture, then convert events to a directory table
    for name in TABLES:
        p = f"/root/testdata/sf0.001/{name}.parquet"
        if os.path.isfile(p):
            shutil.copy2(p, f"{src}/{name}.parquet")
    # materialize before unlinking: the later write re-reads the plan
    ev = spark.read.parquet(f"{src}/events.parquet").localCheckpoint(eager=True)
    n = ev.count()
    os.unlink(f"{src}/events.parquet")
    ev.repartition(3).write.parquet(f"{src}/events.parquet")

    dst = presplit(src, str(tmp_path / "dst"))
    assert os.path.isdir(f"{dst}/events.parquet")
    assert spark.read.parquet(f"{dst}/events.parquet").count() == n
    # and the marker validates (second call is a fast-path hit, same rows)
    dst2 = presplit(src, str(tmp_path / "dst"))
    assert dst2 == dst
