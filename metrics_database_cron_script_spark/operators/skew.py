"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (enabled in the session factory) handles most
skew at runtime by splitting oversized partitions. The salted join here is
the explicit form for the pathological case AQE can't fix: a *broadcast-
ineligible* dimension joined on a key where a handful of values dominate
(the reference's `stashId`/`user_id` analog — a few whales hold most
transactions). The large side gets a random-ish but DETERMINISTIC salt
(hash of the row's unique id, not rand() — replayable), the small side is
exploded ×salt, and the join key becomes (key, salt): hot keys spread over
`salt_factor` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_id_col: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `large ⋈ small` on `key`, salted to `salt_factor` buckets.

    `salt_id_col` is any column of `large` with high cardinality (a row id);
    its hash provides the deterministic salt. `small` must tolerate a
    `salt_factor`× blow-up (it is replicated per salt value).

    Only inner/left(-semi/anti relative to large) semantics are sound:
    under right/full outer, an unmatched small-side key survives once per
    SALT REPLICA — salt_factor duplicate rows — so those modes are
    rejected instead of silently multiplying."""
    norm = how.lower().replace("_", "")
    if norm not in ("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti joins, got "
            f"how={how!r}: outer-preserving the replicated small side "
            "duplicates its unmatched keys x salt_factor"
        )
    salted_large = large.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_id_col)), F.lit(salt_factor)).cast("int")
    )
    salts = F.array(*[F.lit(i) for i in range(salt_factor)])
    salted_small = small.withColumn("__salt", F.explode(salts))
    out = salted_large.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")
