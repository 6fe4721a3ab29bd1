"""Pandas UDF surface (SURVEY.md §2.B "UDF / pandas UDF").

The engine's stance is that UDFs are the slow path — every production
operator is built-in/codegen'd. This module exists to prove the Arrow-batched
UDF surface works and matches the JVM-side computation bit-for-bit: the
flagship dollar-value formula (reference R11, updatescript.py:69-77) as a
vectorized numpy computation. ``c_udf_pandas`` must hash-match ``r_tx_enrich``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


@F.pandas_udf("double")
def tx_dollar_value(
    successful: pd.Series, stake: pd.Series, bonded: pd.Series, price: pd.Series
) -> pd.Series:
    # Same IEEE double ops as the built-in CASE expression → bitwise equal,
    # INCLUDING three-valued null semantics: a NULL `successful` skips the
    # first WHEN (it is not definitely-false), NULL operands propagate
    # through the arithmetic as NaN, and NaN round-trips to SQL NULL
    # through Arrow — so nulls hash-match the CASE too, not just clean rows.
    st, bd, pr = stake.to_numpy(), bonded.to_numpy(), price.to_numpy()
    arith = np.where(st == bd, st * pr, np.abs(st - bd) * pr)
    suc_false = (successful.astype("boolean") == False).fillna(  # noqa: E712
        False
    ).to_numpy(dtype=bool)
    return pd.Series(np.where(suc_false, 0.0, arith))


@F.pandas_udf("double")
def pd_mean(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF — the aggregate-UDF surface that also works
    OVER a window frame (unlike applyInPandas); Arrow-batched per group."""
    return float(v.mean())


def compression_ratio_udf():
    """Arrow-batched zlib compression ratio (compressed/raw bytes) — the
    classic repetitiveness/quality heuristic that genuinely is not
    SQL-expressible (needs a real compressor). Pandas UDF, never per-row
    Python: one zlib call per document inside a vectorized batch."""
    import zlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ratio(texts: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return None
            raw = t.encode("utf-8")
            return round(len(zlib.compress(raw, 6)) / len(raw), 6)

        return texts.map(one)

    return ratio
