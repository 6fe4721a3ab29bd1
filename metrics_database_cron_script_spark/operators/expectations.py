"""Declarative data-quality expectations: single-pass validate + route.

The pattern Delta Live Tables calls expectations and Great Expectations
calls a checkpoint, engine-native: a rule set `{name: Column<boolean>}` is
evaluated ONCE per row as plain JVM expressions, each row is routed to the
good or quarantine side, and per-rule violation counts ride the caller's
own action as `df.observe` metrics — at 100 TB the difference between
"audit the batch" costing zero extra jobs and costing one full re-scan
per rule.

Null semantics follow SQL constraints: a rule passes unless it evaluates
to FALSE — NULL (unknown) does not quarantine. Wrap a rule in
`coalesce(cond, lit(False))` for null-rejecting checks.

Reference anchor: the reference's only "validation" is crashing on a
missing price day (updatescript.py:67); `pipelines.update_tx_enriched`
keeps that invariant, this module generalizes it to arbitrary rule sets.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

_FLAG = "__exp_fail"


@dataclass(frozen=True)
class Validated:
    """Routed outputs + the lazily-populated metrics handle. `metrics()`
    blocks until SOME action has executed one of the routed frames (both
    share the observed parent plan)."""

    good: DataFrame
    quarantined: DataFrame
    _obs: Observation
    _rules: tuple[str, ...]

    def metrics(self) -> dict[str, int]:
        got = self._obs.get
        return {
            "rows": int(got["rows"]),
            **{name: int(got[f"viol_{name}"]) for name in self._rules},
        }


def validate(df: DataFrame, rules: dict[str, Column]) -> Validated:
    """Evaluate every rule once per row; quarantine rows failing ANY rule.

    The quarantine side carries a `violated` array naming the failed rules
    (for triage); the good side is schema-identical to the input. Counts
    are per-rule violations plus total rows — a row failing two rules
    increments both, so the counts are rule diagnostics, not a partition
    of rows."""
    if not rules:
        raise ValueError("validate() needs at least one rule")
    fails = [
        F.when(cond.eqNullSafe(F.lit(False)), F.lit(name))
        for name, cond in rules.items()
    ]
    flagged = df.withColumn(
        _FLAG, F.array_compact(F.array(*fails))
    )
    obs = Observation()
    flagged = flagged.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        *[
            F.sum(
                F.when(F.array_contains(_FLAG, name), 1).otherwise(0)
            ).alias(f"viol_{name}")
            for name in rules
        ],
    )
    good = flagged.filter(F.size(_FLAG) == 0).drop(_FLAG)
    quarantined = flagged.filter(F.size(_FLAG) > 0).withColumnRenamed(
        _FLAG, "violated"
    )
    return Validated(
        good=good,
        quarantined=quarantined,
        _obs=obs,
        _rules=tuple(rules),
    )
