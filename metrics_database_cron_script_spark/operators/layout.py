"""Data-layout governance: clustered and Z-ordered parquet writes.

At 100 TB the cheapest scan is the one that never reads the data: parquet
row-group min/max statistics (and file-level stats in table formats like
Iceberg/Delta) let any engine skip whole chunks — but only if the writer
CLUSTERED the data so each chunk's [min, max] envelope is narrow. A table
appended in arrival order interleaves every key range into every file, so
its envelopes all span the full domain and nothing can be skipped.

Two writers:

- `clustered_write`: range-partition + sort on the cluster columns —
  optimal for one-dimensional predicates (the classic time-series layout:
  cluster by day, prune everything outside the queried window).
- `clustered_write(..., zorder=True)`: interleave the bits of the cluster
  columns' RANKS (true Z-order on quantile ranks, so skew in the raw
  values cannot collapse the curve) and range-partition on the interleaved
  value — each output file covers a small HYPERCUBE of the key space, so
  predicates on ANY clustered column (not just the leading one) skip most
  files. This is the same trade Delta's OPTIMIZE ZORDER BY makes: slightly
  wider per-column envelopes than a linear sort on that column alone, in
  exchange for bounded envelopes on every clustered column at once.

Everything is built from repartitionByRange / sortWithinPartitions /
built-in bit expressions — the write itself is one exchange + local sort,
no UDFs, no driver-side data. The layout property (narrow per-file
min/max envelopes) is asserted from the parquet footers in
tests/test_layout.py, which is exactly the metadata any engine's pruning
consults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# bits of rank precision per column in the Z-value: 2^8 = 256 quantile
# buckets per column. Envelope granularity only has to outnumber output
# FILES (a layout job writes thousands, not millions); 3 cols × 8 bits
# fits comfortably in a long with room to raise `bits` if ever needed.
_Z_BITS = 8


def zorder_value(df: DataFrame, cols: list[str], bits: int = _Z_BITS) -> DataFrame:
    """Append a `__z` column: the bit-interleave of each cluster column's
    QUANTILE-BUCKET rank. Ranking on quantiles (not raw values) makes the
    curve immune to value skew — a heavy-tailed distribution still spreads
    uniformly across the Z domain.

    Scale shape: the 2^bits-1 bucket boundaries for ALL columns come from
    ONE multi-column `approxQuantile` pass (Greenwald-Khanna partials,
    fixed-size driver result — the same class as a broadcast build); the
    rank itself is then a pure per-row expression over the broadcast
    boundary array (count of boundaries ≤ value). No global window, no
    extra shuffle — a global `percent_rank` would funnel the whole table
    through ONE partition, which is exactly the kind of plan this module
    exists to avoid."""
    if not 2 <= len(cols) <= 3:
        raise ValueError("zorder needs 2-3 columns; 1 column is a plain sort")
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    num_names = [f"__n{i}" for i in range(len(cols))]
    out = df
    # rank sources must be genuinely numeric: a DATE cast to double is an
    # AnalysisException and a STRING casts to all-NULL — which would make
    # approxQuantile return no boundaries and silently zero that column's
    # contribution to the curve. Map temporal types through their epoch
    # representation and reject non-orderable-as-number types loudly.
    for c, num_name in zip(cols, num_names):
        dt = df.schema[c].dataType.simpleString()
        col = F.col(c)
        if dt == "date":
            col = F.unix_date(col).cast("double")
        elif dt.startswith("timestamp"):
            col = col.cast("timestamp").cast("double")
        elif dt in ("string", "binary", "boolean") or dt.startswith(
            ("array", "map", "struct")
        ):
            raise ValueError(
                f"zorder column {c!r} has type {dt}: no numeric order to "
                "rank on — hash-bucket or dictionary-encode it first"
            )
        else:
            col = col.cast("double")
        out = out.withColumn(num_name, col)
    # one input scan for every column's boundaries
    all_bounds = out.stat.approxQuantile(num_names, probs, 0.001)

    def _rank_fn(n):
        # factory, not a default-arg lambda: pyspark's HOF lambdas must
        # declare exactly the arity of the callback
        return lambda acc, b: acc + F.when(F.col(n) >= b, 1).otherwise(0)

    rank_cols = []
    for i, (num_name, bounds) in enumerate(zip(num_names, all_bounds)):
        # boundary ties under skew are harmless: equal boundaries merge
        # buckets
        lit_bounds = F.array(*[F.lit(float(b)) for b in bounds])
        rank = F.aggregate(lit_bounds, F.lit(0), _rank_fn(num_name))
        rname = f"__r{i}"
        out = out.withColumn(rname, rank.cast("long"))
        rank_cols.append(rname)
    out = out.drop(*num_names)
    n = len(cols)
    # interleave: bit b of rank i lands at position b*n + i
    parts = []
    for i in range(n):
        for b in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(F.col(rank_cols[i]), b).bitwiseAND(F.lit(1)),
                    b * n + i,
                )
            )
    z = parts[0]
    for p in parts[1:]:
        z = z.bitwiseOR(p)
    return out.withColumn("__z", z.cast("long")).drop(*rank_cols)


def clustered_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 8,
    partition_cols: list[str] | None = None,
    zorder: bool = False,
) -> None:
    """Rewrite `df` at `path` so parquet min/max envelopes are narrow along
    `cluster_cols`: range-partition into `n_files` output tasks, sort
    within each, one file per task. With `zorder=True` the range partition
    and sort run on the interleaved-rank `__z` value instead of the
    lexicographic column order. `partition_cols` adds directory-level
    partitioning on top (prune by directory first, then by stats)."""
    key_cols = list(cluster_cols)
    if zorder:
        df = zorder_value(df, key_cols)
        key_cols = ["__z"]
    out = df.repartitionByRange(n_files, *[F.col(c) for c in key_cols])
    out = out.sortWithinPartitions(*key_cols)
    if zorder:
        out = out.drop("__z")
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def file_envelopes(path: str, cols: list[str]) -> list[dict]:
    """Per-file [min, max] envelope of each column, read from the parquet
    footers — the exact metadata engines consult to skip files/row groups.
    Returns one dict per data file: {col: (min, max), ..., "__file": name}.
    Driver-side metadata read (footers only, no data)."""
    import os

    import pyarrow.parquet as pq

    out = []
    for dirpath, _dirs, files in os.walk(path):
        for name in sorted(files):
            if not name.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(dirpath, name)).metadata
            env: dict = {"__file": name}
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for c in cols:
                lo = hi = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx[c]).statistics
                    if st is None or not st.has_min_max:
                        lo = hi = None
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                env[c] = (lo, hi)
            out.append(env)
    return out


def pruning_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of data files a stats-based reader can SKIP for the
    predicate `col BETWEEN lo AND hi` — computed from the same footers.
    1.0 = everything skippable, 0.0 = every file overlaps the range (the
    arrival-order layout)."""
    envs = file_envelopes(path, [col])
    if not envs:
        return 0.0
    skipped = sum(
        1
        for e in envs
        if e[col][0] is not None and (e[col][1] < lo or e[col][0] > hi)
    )
    return skipped / len(envs)
