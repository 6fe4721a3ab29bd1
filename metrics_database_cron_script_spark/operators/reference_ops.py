"""Set-based re-expressions of the reference pipelines (SURVEY.md §8, P1–P5).

The reference computes these imperatively with per-row RPCs
(``updatescript.py:57-218``); here each is one declarative DataFrame plan:
scan → filter (pushed down) → broadcast join → window → projection. The
fixture mapping follows FIXTURES.md §C: ``events`` plays the transactions
role (``user_id``→stashId, ``value``→stake, ``props.$.k``→alreadyBonded,
``event_type != 'error'``→successful, ``event_id`` parity→chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Fixed batch watermark (reference: the `lastUpdated` doc read at
# updatescript.py:223; strict `$gt` at :59). Mid-span of the events fixture.
WATERMARK = "2024-01-15 00:00:00"


def tx_view(events: DataFrame) -> DataFrame:
    """events → transaction-shaped view (FIXTURES.md §C mapping)."""
    return events.select(
        F.col("event_id"),
        F.col("ts"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        (F.col("event_type") != "error").alias("successful"),
        F.col("value").alias("stake"),
        F.get_json_object("props", "$.k").cast("double").alias("alreadyBonded"),
        F.when(F.col("event_id") % 2 == 0, "polkadot").otherwise("kusama").alias("chain"),
    )


def daily_price_dim(events: DataFrame) -> DataFrame:
    """P1 analog: the per-day price dimension `{date, price}`
    (reference `dotPriceInUSD`, updatescript.py:43). Hash-agg over the day
    bucket; rounded so both engines agree bit-for-bit downstream."""
    return events.groupBy(F.to_date("ts").alias("date")).agg(
        F.round(F.avg("value"), 6).alias("price")
    )


def incremental_scan(events: DataFrame, watermark: str = WATERMARK) -> DataFrame:
    """R2: strict-greater watermark scan (updatescript.py:59). The comparison
    is a plain predicate → Catalyst pushes it to the parquet reader."""
    return events.filter(F.col("ts") > F.lit(watermark).cast("timestamp"))


# (28,18), NOT (38,18): Spark's decimal type-promotion demotes a
# (38,18)x(38,18) product to scale 6 and a subtraction to scale 17 —
# silently truncating the "exact" mode. (28,18) operands keep scale 18
# through +/- and scale 17 through x (38-cap), the same headroom rule
# r_aum_routing_decimal documents.
MONEY_DECIMAL = "decimal(28,18)"


def tx_enrich(events: DataFrame, money: str = "double") -> DataFrame:
    """P2: enrich each post-watermark tx with its day's price and the
    conditional dollar value (R11/R13, updatescript.py:64-82).

    Reference shape: per-row `find_one` price lookup (N+1). Spark shape:
    broadcast hash join against the tiny price dim — zero per-row RPCs,
    one stage. Inner join = reference's error-on-missing-price semantics
    (invariant I3): a tx on a priceless day is dropped loudly by count
    assertion in the pipeline wrapper, not silently NULLed.

    `money="double"` reproduces the reference's float math
    (updatescript.py:73, oracle parity); `money="decimal"` runs the same
    plan in DecimalType(28,18) — the exact-arithmetic production mode
    (SURVEY.md §4.3; 28 not 38 so products keep scale 17 instead of
    being demoted to 6).
    """
    if money not in ("double", "decimal"):
        raise ValueError(f"money mode must be 'double' or 'decimal', got {money!r}")
    tx = tx_view(incremental_scan(events))
    price = daily_price_dim(events)
    if money == "decimal":
        tx = tx.withColumn("stake", F.col("stake").cast(MONEY_DECIMAL)).withColumn(
            "alreadyBonded", F.col("alreadyBonded").cast(MONEY_DECIMAL)
        )
        price = price.withColumn("price", F.col("price").cast(MONEY_DECIMAL))
    joined = tx.join(
        F.broadcast(price), F.to_date(tx["ts"]) == price["date"], "inner"
    )
    zero = F.lit(0).cast(MONEY_DECIMAL) if money == "decimal" else F.lit(0.0)
    dollar = (
        F.when(~F.col("successful"), zero)
        .when(F.col("stake") == F.col("alreadyBonded"), F.col("stake") * F.col("price"))
        .otherwise(F.abs(F.col("stake") - F.col("alreadyBonded")) * F.col("price"))
    )
    return joined.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "successful",
        "stake",
        "alreadyBonded",
        "date",
        "price",
        dollar.alias("txDollarValue"),
    )


def anti_dedup(events: DataFrame, existing_ids: DataFrame) -> DataFrame:
    """R14: idempotent-insert dedup. The reference probes the target once per
    row (`find_one({"_id"})`, updatescript.py:62); set-based form is a single
    left_anti join — broadcast when the id set is small, shuffle-hash at scale."""
    return events.join(existing_ids, "event_id", "left_anti")


def first_touch(events: DataFrame) -> DataFrame:
    """R15 core: first event per user, canonical order (ts, event_id)
    (updatescript.py:175-186 loop-carried `seen` set → window row_number)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def aum_routing(
    events: DataFrame,
    watermark: str = WATERMARK,
    money: str = "double",
    whale_obs=None,
) -> DataFrame:
    """P5: the nominations/AUM routing matrix (updatescript.py:154-218),
    loop-carried state rewritten as window functions (SURVEY.md §8.P5).

    Batch = successful txs with ts > watermark. Pre-batch AUM key set is
    simulated as the user_ids of successful pre-watermark events. A batch row
    is a *first touch* iff its user is absent from the pre-batch set AND it is
    the first batch row for that user in (ts, event_id) order.

    Routing (Δ = stake − alreadyBonded; chain asymmetry preserved exactly —
    kusama has no amountstaked sink, its Δ>0 rows go to nominations,
    updatescript.py:201-204):

      Δ = 0 → nominations(stake); AUM(stake) iff first-touch
      Δ > 0 → polkadot: amountstaked(Δ); kusama: nominations(Δ);
              AUM(stake if first-touch else Δ)
      Δ < 0 → AUM(stake if first-touch else Δ)

    Output: one row per (event, sink) with the routed volume.

    `money="decimal"` runs the identical routing in DecimalType(28,18):
    at 100 TB the AUM deltas are long exact-sum chains, the first place
    float accumulation drifts (SURVEY.md §7 flag) — same plan, exact
    arithmetic (oracled as `r_aum_routing_decimal`). Precision 28, not the
    MONEY_DECIMAL 38: Spark demotes a (38,18)−(38,18) subtraction to
    scale 17 (precision cap), silently shaving the 18th fractional digit;
    (28,18) operands leave headroom so every delta keeps scale 18 exactly
    — and DuckDB's matching cast then produces bit-identical doubles.

    `whale_obs` (optional pyspark Observation): rides the per-user
    aggregate and records ``max_user_batch`` — the largest per-user
    in-batch list this run materialized — plus ``n_users``. The fused
    shape holds ONE user's batch rows in one aggregation buffer, so a
    skewed "whale" key is the plan's memory hazard. Measured (round 10,
    single-task heap poll around the whale stage, GC'd baseline): a
    1 M-event whale drives ≤ 0.8 GB of JVM heap (~840 B/event upper
    bound — object-backed list entries plus the explode pass; the
    map-side shuffle spill of the same list is 4.8 B/event lz4'd), and
    the output is value-correct (tests/test_routing_property.py::
    test_whale_key_fused_routing_correct_and_observed). Alert on
    max_user_batch ≳ 5 M (≈4 GB buffer at the measured rate): above
    that, route the whale user_ids through the unfused two-pass shape
    (per-user state aggregate joined back to the batch — the pre-round-9
    plan, still expressible with first_touch()+join) and union the
    results; below it, the fused single-scan plan wins on every
    measurement."""
    if money not in ("double", "decimal"):
        raise ValueError(f"money mode must be 'double' or 'decimal', got {money!r}")
    tx = tx_view(events)
    if money == "decimal":
        routing_decimal = "decimal(28,18)"
        tx = tx.withColumn("stake", F.col("stake").cast(routing_decimal)).withColumn(
            "alreadyBonded", F.col("alreadyBonded").cast(routing_decimal)
        )
    wm = F.lit(watermark).cast("timestamp")
    # FUSED single-scan single-shuffle shape (round 9): per-user state
    # (seen-pre flag + batch-first argmin) AND the batch rows themselves
    # ride ONE grouped pass over successful txs — the batch payload is a
    # conditional collect_list on the same aggregate, exploded after. The
    # previous shape aggregated per-user state then joined the batch back
    # (second events scan + stats-driven broadcast of a user-cardinality
    # frame); fusing removes that scan and the join entirely. Measured at
    # sf0.1: 0.421 s vs 0.527 s median (A/B, 7 runs each, value-identical
    # output); at 100 TB the shuffle is O(users + batch rows) either way,
    # but this shape reads the events table ONCE and never materializes a
    # frame that grows with the user base. (A window-function variant
    # measured 0.401 s but shuffles the ENTIRE history — rejected.)
    # History rows reduce map-side to the tiny seen-pre partial (they
    # contribute NULL to the list — collect_list drops nulls); (ts,
    # event_id) is a total order (event_id unique), so the struct-min is
    # deterministic. Per-user batch lists are bounded by one batch
    # window's events per user — the reference's daily cron shape.
    per_user = (
        tx.filter(F.col("successful"))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("ts") <= wm, F.lit(True))).alias("seen_pre"),
            F.min(
                F.when(F.col("ts") > wm, F.struct("ts", "event_id"))
            ).alias("__first"),
            F.collect_list(
                F.when(
                    F.col("ts") > wm,
                    F.struct("event_id", "ts", "stake", "alreadyBonded", "chain"),
                )
            ).alias("__batch"),
        )
    )
    if whale_obs is not None:
        per_user = per_user.observe(
            whale_obs,
            F.max(F.size("__batch")).alias("max_user_batch"),
            F.count(F.lit(1)).alias("n_users"),
        )
    b = F.col("b")
    flagged = (
        per_user.select("seen_pre", "__first", F.explode("__batch").alias("b"))
        .withColumn(
            "first_touch",
            F.col("seen_pre").isNull()
            & (
                F.struct(b.ts.alias("ts"), b.event_id.alias("event_id"))
                == F.col("__first")
            ),
        )
        .withColumn("delta", b.stake - b.alreadyBonded)
        .select(
            b.event_id.alias("event_id"),
            b.chain.alias("chain"),
            b.stake.alias("stake"),
            "first_touch",
            "delta",
        )
    )

    # Single-pass fan-out: each row emits an array of (sink, volume) entries,
    # nulls filtered, exploded. One scan + one explode — a 3-way union of
    # filtered branches would recompute the flags per branch.
    delta, stake, chain = F.col("delta"), F.col("stake"), F.col("chain")
    entry = lambda sink, vol: F.struct(F.lit(sink).alias("sink"), vol.alias("volume"))  # noqa: E731
    routed = F.array(
        F.when(delta == 0, entry("nominations", stake)).when(
            (delta > 0) & (chain == "kusama"), entry("nominations", delta)
        ),
        F.when((delta > 0) & (chain == "polkadot"), entry("amountstaked", delta)),
        F.when(
            (delta != 0) | F.col("first_touch"),
            entry("aum", F.when(F.col("first_touch"), stake).otherwise(delta)),
        ),
    )
    return flagged.select(
        "event_id",
        "chain",
        F.explode(F.filter(routed, lambda e: e.isNotNull())).alias("e"),
    ).select("event_id", "chain", F.col("e.sink").alias("sink"), F.col("e.volume").alias("volume"))


def stats_ratio(events: DataFrame) -> DataFrame:
    """P3 analog: percentMarketCaptured = 100·managed/staked
    (updatescript.py:123) — managed = purchase value, staked = all value."""
    return events.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0))
            / F.sum("value"),
            6,
        ).alias("percentMarketCaptured")
    )


def union_chains(events: DataFrame) -> DataFrame:
    """R24: the dual-chain duplicated pipeline becomes one parameterized
    plan unioned with a `chain` discriminator column."""
    dot = events.filter(F.col("event_id") % 2 == 0).withColumn("chain", F.lit("polkadot"))
    ksm = events.filter(F.col("event_id") % 2 != 0).withColumn("chain", F.lit("kusama"))
    return dot.unionByName(ksm)


def upsert_snapshot(events: DataFrame) -> DataFrame:
    """R9/R25 on plain parquet: keep-latest row per key — the set-based form
    of `update_one({"_id"}, {"$set": ...})` (updatescript.py:131). Latest =
    max (ts, event_id) per user_id.

    Expressed as a decomposable argmax — `max(struct(ts, event_id,
    payload...))` per key. Spark plans struct-max as a SortAggregate
    (struct values don't fit the hash-agg's mutable buffer), but the split
    that matters survives: `partial_max` runs BELOW the exchange with a
    key-only sort, so exactly one winner row per key per task crosses the
    wire — same shuffle volume as the WindowGroupLimit-pruned window form,
    with a 1-column sort comparator instead of the window's 3-column one.
    (ts, event_id) leads the struct, so payload fields never influence the
    comparison ((ts, event_id) is already a total order)."""
    payload = [c for c in events.columns if c != "user_id"]
    ordered = ["ts", "event_id"] + [c for c in payload if c not in ("ts", "event_id")]
    latest = events.groupBy("user_id").agg(
        F.max(F.struct(*ordered)).alias("__latest")
    )
    return latest.select(
        "user_id", *[F.col(f"__latest.{c}").alias(c) for c in ordered]
    ).select(*events.columns)


def calendar_fill(events: DataFrame) -> DataFrame:
    """R17/R26: day spine from the first event day through 7 days past the
    last (the reference generates days from the watermark through *today*,
    updatescript.py:31-33 — "today" here is last-event-day + 7), anti-joined
    against days that already have purchase events — the daily-gate 'which
    days still need a row' probe (updatescript.py:36-37)."""
    spine = events.agg(
        F.min(F.to_date("ts")).alias("lo"),
        F.date_add(F.max(F.to_date("ts")), 7).alias("hi"),
    ).select(F.explode(F.sequence("lo", "hi")).alias("day"))
    have = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.to_date("ts").alias("day"))
        .distinct()
    )
    return spine.join(have, "day", "left_anti")


def incremental_agg_merge(events: DataFrame, watermark: str = WATERMARK) -> DataFrame:
    """Incremental rollup maintenance (the 'hypertable rollup' shape): the
    standing daily aggregate — count, sum, min, max per day — is advanced by
    merging the POST-watermark delta's partial aggregate into the pre-
    watermark snapshot with a full-outer join + coalesce, never by
    recomputing history. All four merged stats are decomposable aggregates
    (count/sum add; min/max take least/greatest), which is exactly the
    partial/final split Spark's own hash aggregate uses — re-expressed
    across batches instead of across tasks.

    At 100 TB: the delta agg is O(new rows), the merge shuffle is O(touched
    days), and the snapshot side is read pruned to the merge's day keys —
    the run cost tracks the daily delta, not the table (the reference pays
    the same contract via its `$gt` scan, updatescript.py:59, but then
    recomputes each day bucket row-by-row).

    (In this fixture both sides derive from `events`; in the pipeline the
    snapshot side is the standing parquet rollup maintained by state.py.)
    """
    wm = F.lit(watermark).cast("timestamp")
    snap = daily_rollup(events.filter(F.col("ts") <= wm))
    delta = daily_rollup(events.filter(F.col("ts") > wm))
    merged = merge_daily_rollups(snap, delta)
    return merged.withColumn("sum_value", F.round("sum_value", 6))


def daily_rollup(events: DataFrame, money: bool = False) -> DataFrame:
    """The standing daily rollup's shape: count/sum/min/max of `value` per
    day — every stat decomposable, so batches merge exactly
    (`merge_daily_rollups`).

    `money=True` accumulates `sum_value` in DECIMAL(28,18) (the
    r_aum_routing_decimal money mode): each double is rounded once to a
    fixed 18-dp grid, after which addition is EXACT and order-independent
    — so a micro-batch merge sequence reproduces the batch aggregate
    bit-for-bit (float64 sums differ across accumulation orders at ~1e-9
    relative, the round-8 streaming-twin carve-out). (28,18) rather than
    (38,18) is load-bearing: Spark's sum widens (28,18)→(38,18) and the
    merge addition (28,18)+(28,18)→(29,18), both exact, while
    (38,18)+(38,18) would overflow precision 38 and demote to scale 17 —
    a silent digit loss. The final cast back to (28,18) is exact while
    per-day sums fit 10 integer digits (SFXL: ~1e8)."""
    sum_col = (
        F.sum(F.col("value").cast("decimal(28,18)")).cast("decimal(28,18)")
        if money
        else F.sum("value")
    )
    return events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        sum_col.alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def merge_daily_rollups(snap: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two daily rollups (full-outer on day + coalesce per stat).
    Deliberately does NOT round: the stateful pipeline merges every batch,
    and rounding inside the merge would accumulate drift across batches —
    readers round at the edge (r_agg_maintenance does, pipelines stay
    exact).

    Type-transparent over sum_value: in the DECIMAL(28,18) money mode the
    zero literal and the result are cast to the INPUT's decimal type — a
    bare 0.0 double literal would promote the whole addition to double
    (losing exactness), and leaving the sum at the widened (29,18) would
    compound to a scale-17 demotion on the next merge."""
    s, d = snap.alias("s"), delta.alias("d")
    sum_type = snap.schema["sum_value"].dataType
    zero = F.lit(0).cast(sum_type)
    return (
        s.join(d, F.col("s.day") == F.col("d.day"), "full_outer")
        .select(
            F.coalesce(F.col("s.day"), F.col("d.day")).alias("day"),
            (F.coalesce(F.col("s.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))).alias("n"),
            (
                F.coalesce(F.col("s.sum_value"), zero)
                + F.coalesce(F.col("d.sum_value"), zero)
            ).cast(sum_type).alias("sum_value"),
            F.least(
                F.coalesce(F.col("s.min_value"), F.col("d.min_value")),
                F.coalesce(F.col("d.min_value"), F.col("s.min_value")),
            ).alias("min_value"),
            F.greatest(
                F.coalesce(F.col("s.max_value"), F.col("d.max_value")),
                F.coalesce(F.col("d.max_value"), F.col("s.max_value")),
            ).alias("max_value"),
        )
    )
