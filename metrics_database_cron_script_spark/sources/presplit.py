"""Fixture layout optimizer: single-file parquet → multi-file directory.

The driver fixtures arrive as ONE parquet file with ONE row group per table
(TESTDATA.md), so every scan — however wide the session — runs as a single
task: Spark can split a parquet file only at row-group boundaries. Real
100 TB tables are the opposite shape (thousands of files / row groups), and
every scan-heavy operator (window partial prunes, per-partition top-k,
explode+hash pipelines) parallelizes across them for free.

`presplit` rewrites a fixture dir into that realistic layout once, byte-
preserving (pyarrow read → sliced writes: the physical schema, including
ns-precision timestamps, survives exactly — a Spark rewrite would rewrite
types and break the DuckDB oracle's view of the same files). Both the Spark
engine and the DuckDB baseline read the SAME presplit copy, so comparisons
stay apples-to-apples.

This is bench-harness infrastructure, not a query-path dependency: the
correctness gate keeps reading the driver's original single-file fixtures.
"""

from __future__ import annotations

import json
import os

# target bytes per output file — small enough that sf0.1's 2–10 MB fact
# tables fan out across local cores (compressed parquet decompresses ~4×, so
# a 512 KB file is ~2 MB of in-memory work), irrelevant at real scale where
# the writer's own file sizing governs
_TARGET_FILE_BYTES = 512 * 1024
_MAX_FILES = 32
_MARKER = "_PRESPLIT.json"


def presplit(
    src_sf_dir: str,
    dst_sf_dir: str,
    target_file_bytes: int = _TARGET_FILE_BYTES,
    max_files: int = _MAX_FILES,
) -> str:
    """Rewrite every fixture table under `src_sf_dir` as a directory of
    row-preserving parquet slices under `dst_sf_dir`. Idempotent: a marker
    records the source files' (size, mtime); a matching marker skips the
    rewrite, a stale one triggers it. Returns `dst_sf_dir`."""
    from metrics_database_cron_script_spark.sources.tables import TABLES, table_path

    src_root = src_sf_dir.rstrip("/")
    dst_root = dst_sf_dir.rstrip("/")

    def _fingerprint():
        fp = {}
        for name in TABLES:
            p = table_path(src_root, name)
            if os.path.isfile(p):
                st = os.stat(p)
                # ns-resolution mtime: a same-size in-place rewrite within
                # the same wall-clock second must still invalidate
                fp[name] = [st.st_size, st.st_mtime_ns]
            elif os.path.isdir(p):
                # directory-shaped source table (already multi-file):
                # fingerprint its parquet members so it participates in
                # marker validation like any other table
                tot, mt, cnt = 0, 0, 0
                for root, _d, files in os.walk(p):
                    for f in files:
                        if f.endswith(".parquet"):
                            st = os.stat(os.path.join(root, f))
                            tot += st.st_size
                            mt = max(mt, st.st_mtime_ns)
                            cnt += 1
                fp[name] = [tot, mt, cnt]
        return fp

    marker_path = os.path.join(dst_root, _MARKER)

    def _marker_hit(fp):
        if not os.path.isfile(marker_path):
            return False
        try:
            with open(marker_path) as f:
                marker_ok = json.load(f) == {"src": src_root, "files": fp, "target": target_file_bytes, "max": max_files}
        except (OSError, ValueError):
            marker_ok = False
        # a marker hit is only valid if every fingerprinted table's output
        # directory actually exists (someone may have deleted a dst table)
        return marker_ok and all(
            os.path.isdir(table_path(dst_root, name)) for name in fp
        )

    fingerprint = _fingerprint()
    if _marker_hit(fingerprint):
        return dst_root

    # Cross-process exclusion: two bench processes sharing .bench_cache must
    # not interleave rmtree/write/marker (the loser could validate a
    # half-rewritten dir). An exclusive flock serializes rewriters; the
    # blocked process re-checks the marker after the winner finishes and
    # usually returns without rewriting. Readers that bypass presplit()
    # entirely are not protected — every engine/oracle entry point resolves
    # the dir through this call.
    os.makedirs(dst_root, exist_ok=True)
    import fcntl

    lock = open(os.path.join(dst_root, ".presplit.lock"), "w")
    try:
        fcntl.flock(lock, fcntl.LOCK_EX)
        fingerprint = _fingerprint()  # src may have changed while we waited
        if _marker_hit(fingerprint):
            return dst_root
        _rewrite(src_root, dst_root, fingerprint, target_file_bytes, max_files, marker_path)
        return dst_root
    finally:
        fcntl.flock(lock, fcntl.LOCK_UN)
        lock.close()


def _rewrite(src_root, dst_root, fingerprint, target_file_bytes, max_files, marker_path):
    import pyarrow.parquet as pq

    from metrics_database_cron_script_spark.sources.tables import TABLES, table_path

    # Invalidate FIRST: while tables below are being rmtree'd/rewritten the
    # old marker could still match the unchanged src fingerprint, so a
    # concurrent (or post-crash) fast-path check would validate a
    # half-rewritten dir. With the marker gone, every other path falls
    # through to the flock and waits (or, after a crash, rebuilds).
    try:
        os.unlink(marker_path)
    except FileNotFoundError:
        pass

    for name in TABLES:
        src = table_path(src_root, name)
        dst = table_path(dst_root, name)  # <dst>/<name>.parquet/ directory
        if not os.path.isfile(src):
            if os.path.isdir(src):
                # already multi-file at the source: mirror it into the
                # bench copy via hardlinks — silently dropping it (the old
                # behavior) left every later read of this table failing on
                # the presplit dir while presplit itself reported success
                import shutil

                if os.path.isdir(dst):
                    shutil.rmtree(dst)
                for root, _d, files in os.walk(src):
                    rel = os.path.relpath(root, src)
                    out = dst if rel == "." else os.path.join(dst, rel)
                    os.makedirs(out, exist_ok=True)
                    for f in files:
                        if f.startswith(("_", ".")):
                            continue
                        sp, dp = os.path.join(root, f), os.path.join(out, f)
                        try:
                            os.link(sp, dp)
                        except OSError:
                            shutil.copy2(sp, dp)
                continue
            # src table gone (or never existed): a leftover dst dir from a
            # previous run must not outlive it — the oracle and Spark would
            # keep serving rows for a table the source no longer has
            if os.path.isdir(dst):
                import shutil

                shutil.rmtree(dst)
            continue
        tbl = pq.read_table(src)
        n_rows = tbl.num_rows
        size = os.path.getsize(src)
        n_files = max(1, min(max_files, -(-size // target_file_bytes), n_rows or 1))
        # clean rebuild (stale marker / partial previous run)
        if os.path.isdir(dst):
            import shutil

            shutil.rmtree(dst)
        os.makedirs(dst)
        per = -(-n_rows // n_files) if n_rows else 1  # ceil
        i = 0
        off = 0
        while off < n_rows or (n_rows == 0 and i == 0):
            pq.write_table(tbl.slice(off, per), os.path.join(dst, f"part-{i:04d}.parquet"))
            off += per
            i += 1
    with open(marker_path, "w") as f:
        json.dump({"src": src_root, "files": fingerprint, "target": target_file_bytes, "max": max_files}, f)
