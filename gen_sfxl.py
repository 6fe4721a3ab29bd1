#!/usr/bin/env python
"""Synthesize a larger benchmark dataset from the sf0.1 fixtures.

The driver ships sf up to 0.1 (~600 k lineitem rows) — small enough that
local Spark latency is dominated by per-action fixed cost, which makes the
DuckDB ratio uninformative about plan quality. This builds an N× replica
dataset (default 10× ≈ "sf1": 6 M lineitem rows, 1 M events) so
SCALE.md-Appendix-A/bench_compare can show the regime where compute, not overhead,
dominates — the trend that predicts cluster-scale behavior.

Replication is KEY-CONSISTENT, not naive duplication:
- every replica i offsets each table's synthetic keys by i·stride (stride =
  a power of 10 above the base max), so foreign keys keep joining exactly
  as in the base data and fan-ins/fan-outs per key stay realistic —
  orders×10 join customers×10, not 10 copies piling on one key;
- nation/region (fixed dimensions) are copied once;
- document text is prefixed with a replica tag so near-dup structure stays
  comparable instead of every doc gaining 9 exact clones;
- embeddings and all measures/timestamps are copied verbatim (ties are
  broken by id everywhere in the query contract).

Optional DELIBERATE SKEW (`--skew-mod M`): in every replica i>0, rows whose
BASE key satisfies `key % M == 0` keep a single global hot key instead of
the replica-offset one — `events.user_id` collapses onto the hottest user
and `lineitem.l_orderkey` onto one order. FK integrity holds (the hot key
exists in replica 0), so joins stay correct while one join key carries
~1/M of the whole fact side: the shape AQE's skew-join splitting exists
for, at a footprint (≥4 GiB at 256 replicas) that crosses the engine's
AQE gate.

Output: `<out>/<table>.parquet/part-r{i:02d}.parquet` (already multi-file —
bench_dir reads it directly). Usage:

    python gen_sfxl.py [replicas] [src_sf_dir] [out_dir] [--skew-mod M]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# per-table key columns that must be offset per replica, keyed by the
# logical entity so strides stay consistent ACROSS tables (FK integrity)
ENTITY_KEYS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "event": [("events", "event_id")],
    "user": [("events", "user_id")],
    "doc": [("documents", "doc_id")],
    "vec": [("embeddings", "vec_id")],
}
COPY_ONCE = ("nation", "region")


def _stride(max_val: int) -> int:
    s = 10
    while s <= max_val:
        s *= 10
    return s


# (table, key column) -> hot-key selector: which rows of replicas >0 keep a
# single global hot key when --skew-mod is set
SKEW_KEYS = [("events", "user_id"), ("lineitem", "l_orderkey")]


def replicate(
    src: str,
    out: str,
    replicas: int,
    skew_mod: int | None = None,
    tables: list[str] | None = None,
) -> dict[str, int]:
    """Key-consistent N× replication (see module docstring). Returns the
    per-table output row counts. `tables` restricts the output to a subset
    (e.g. a documents-only corpus for dedup-family scaling a decade past
    the full-table footprint) — FK strides are still computed from every
    table carrying the entity so a later widening stays key-consistent."""
    from metrics_database_cron_script_spark.sources.tables import TABLES, table_path

    tables = list(TABLES) if tables is None else tables
    unknown = set(tables) - set(TABLES)
    if unknown:
        raise ValueError(f"unknown tables: {sorted(unknown)}")
    base: dict[str, pa.Table] = {
        t: pq.read_table(table_path(src, t)) for t in tables
    }
    skew: dict[str, tuple[str, object, object]] = {}
    if skew_mod:
        for t, c in SKEW_KEYS:
            if t not in base:
                continue
            col = base[t].column(c)
            # hot key = the minimum base key (guaranteed to exist in
            # replica 0, so FK joins stay satisfiable)
            hot = pc.min(col)
            assert skew_mod & (skew_mod - 1) == 0, "--skew-mod must be a power of 2"
            mask = pc.equal(pc.bit_wise_and(col.cast("int64"), skew_mod - 1), 0)
            skew[t] = (c, mask, hot)
    # one stride per entity, from the max over EVERY table carrying that
    # key — including tables excluded from this run's output. A restricted
    # run (--tables lineitem) must pick the same power-of-10 stride a later
    # full run would, or the promised key-consistent widening silently
    # breaks; absent tables contribute via a key-column-only read (cheap).
    strides: dict[str, int] = {}
    for ent, cols in ENTITY_KEYS.items():
        if not any(t in base for t, _ in cols):
            continue
        m = 0
        for t, c in cols:
            if t in base:
                col = base[t].column(c)
            elif os.path.exists(table_path(src, t)):
                col = pq.read_table(table_path(src, t), columns=[c]).column(c)
            else:
                # a trimmed source fixture may legitimately lack a sibling
                # table; it then can't appear in ANY run over this source,
                # so skipping it keeps strides consistent across runs
                continue
            m = max(m, pc.max(col).as_py() or 0)
        strides[ent] = _stride(int(m))

    offsets_by_table: dict[str, list[tuple[str, int]]] = {}
    for ent, cols in ENTITY_KEYS.items():
        for t, c in cols:
            if ent in strides:
                offsets_by_table.setdefault(t, []).append((c, strides[ent]))

    counts: dict[str, int] = {}
    for t in tables:
        dst = table_path(out, t)
        os.makedirs(dst, exist_ok=True)
        for f in os.listdir(dst):
            os.remove(os.path.join(dst, f))
        n_rep = 1 if t in COPY_ONCE else replicas
        for i in range(n_rep):
            tbl = base[t]
            if i > 0:
                for c, stride in offsets_by_table.get(t, []):
                    col = tbl.column(c)
                    shifted = pc.add(col, pa.scalar(i * stride, type=col.type))
                    if t in skew and skew[t][0] == c:
                        # selected rows collapse onto the global hot key
                        _c, mask, hot = skew[t]
                        shifted = pc.if_else(mask, hot.cast(col.type), shifted)
                    tbl = tbl.set_column(
                        tbl.schema.get_field_index(c),
                        tbl.schema.field(c),
                        shifted,
                    )
                if t == "documents":
                    tag = f"replica{i}:: "  # unlikely to prefix-collide with real text
                    idx = tbl.schema.get_field_index("text")
                    col = tbl.column("text").cast("string")
                    # scalar broadcast (no O(rows) Python list); NULL text
                    # stays NULL rather than being silently dropped
                    tagged = pc.if_else(
                        pc.is_null(col),
                        col,
                        pc.binary_join_element_wise(pa.scalar(tag), col, ""),
                    )
                    tbl = tbl.set_column(idx, tbl.schema.field("text"), tagged.cast(tbl.schema.field("text").type))
                    # keep the fixture invariant n_chars == len(text)
                    nc_idx = tbl.schema.get_field_index("n_chars")
                    nc = tbl.column("n_chars")
                    tbl = tbl.set_column(
                        nc_idx,
                        tbl.schema.field("n_chars"),
                        pc.if_else(
                            pc.is_null(col),
                            nc,
                            pc.add(nc, pa.scalar(len(tag), type=nc.type)),
                        ),
                    )
            # multiple row groups per file: Spark and DuckDB both
            # parallelize within a parquet file at row-group granularity,
            # so scan width is not capped at one thread per replica
            pq.write_table(
                tbl,
                os.path.join(dst, f"part-r{i:02d}.parquet"),
                row_group_size=max(50_000, -(-tbl.num_rows // 4)),
            )
        counts[t] = sum(
            pq.ParquetFile(os.path.join(dst, f)).metadata.num_rows
            for f in os.listdir(dst)
        )
    return counts


def main() -> None:
    args = list(sys.argv[1:])
    skew_mod = None
    if "--skew-mod" in args:
        i = args.index("--skew-mod")
        skew_mod = int(args[i + 1])
        del args[i : i + 2]
    tables = None
    if "--tables" in args:
        i = args.index("--tables")
        tables = args[i + 1].split(",")
        del args[i : i + 2]
    replicas = int(args[0]) if len(args) > 0 else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    # skewed runs default to their OWN directory: defaulting to sf1 would
    # silently overwrite the uniform replicas BENCH_COMPARE_SF1.json is
    # measured on with deliberately skewed data
    default_name = "sfxl" if skew_mod else "sf1"
    out = (
        args[2]
        if len(args) > 2
        else os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".bench_cache", default_name
        )
    )
    for t, rows in replicate(src, out, replicas, skew_mod=skew_mod, tables=tables).items():
        print(f"{t}: {rows} rows")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
