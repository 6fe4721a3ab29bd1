"""Streaming-shaped queries (`s_*`, SURVEY.md §2.C), batch-executed so the
DuckDB oracle can check them; `streaming/structured.py` runs the same logic
under readStream (exercised by tests, not the oracle gate)."""

from __future__ import annotations

from metrics_database_cron_script_spark.plans.registry import query
from metrics_database_cron_script_spark.sources import load_table
from metrics_database_cron_script_spark.streaming import windows as SW


@query(
    "s_tumbling",
    oracle="""
SELECT date_trunc('day', ts) AS win_start,
       date_trunc('day', ts) + INTERVAL 1 DAY AS win_end,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS total
FROM events GROUP BY 1, 2""",
)
def s_tumbling(spark, sf_dir):
    return SW.tumbling(load_table(spark, sf_dir, "events"))


@query(
    "s_sliding",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('day', min(ts)) - INTERVAL 1 HOUR AS lo, max(ts) AS hi FROM events
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS win_start FROM bounds
)
SELECT s.win_start, s.win_start + INTERVAL 1 HOUR AS win_end,
       COUNT(*) AS n, ROUND(SUM(e.value), 2) AS total
FROM spine s
JOIN events e ON e.ts >= s.win_start AND e.ts < s.win_start + INTERVAL 1 HOUR
GROUP BY 1, 2""",
)
def s_sliding(spark, sf_dir):
    # Spark emits only non-empty windows aligned to epoch multiples of the
    # slide; the oracle generates the same 15-min-aligned spine and inner-joins
    # so empty windows vanish identically.
    return SW.sliding(load_table(spark, sf_dir, "events"))


@query(
    "s_session",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS total
FROM sess GROUP BY user_id, sess_id""",
)
def s_session(spark, sf_dir):
    return SW.session(load_table(spark, sf_dir, "events"))


@query(
    "s_session_islands",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS total
FROM sess GROUP BY user_id, sess_id""",
)
def s_session_islands(spark, sf_dir):
    """First-principles sessionization (lag + gap cumsum) — must agree with
    s_session's native session_window on every boundary tie."""
    return SW.session_gaps_islands(load_table(spark, sf_dir, "events"))


@query(
    "s_late_data",
    oracle="""
SELECT event_id, ts, user_id,
       ts < (SELECT max(ts) FROM events) - INTERVAL 1 DAY AS is_late
FROM events""",
)
def s_late_data(spark, sf_dir):
    return SW.late_data_flags(load_table(spark, sf_dir, "events"))


@query(
    "s_dedup_watermark",
    oracle="""
WITH horizon AS (SELECT max(ts) - INTERVAL 1 DAY AS cutoff FROM events),
ranked AS (
  SELECT event_id, user_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events, horizon WHERE ts >= cutoff
)
SELECT event_id, user_id, event_type, ts FROM ranked WHERE rn = 1""",
)
def s_dedup_watermark(spark, sf_dir):
    """Streaming ``dropDuplicates`` semantics in batch: within the watermark
    horizon (max(ts) − 1 day), keep the first row per (user_id, event_type)
    in event-time order with event_id as the deterministic arrival
    tie-break — the batch oracle for
    ``withWatermark('ts','1 day').dropDuplicates([...])``
    (streaming/structured.py runs the same key-dedup under readStream)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg((F.max("ts") - F.expr("INTERVAL 1 DAY")).alias("c"))
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.join(F.broadcast(cutoff), F.col("ts") >= F.col("c"), "inner")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )


@query(
    "s_windowed_topk",
    oracle="""
WITH agg AS (
  SELECT date_trunc('day', ts) AS win_start, user_id,
         ROUND(SUM(value), 2) AS total
  FROM events GROUP BY 1, 2
)
SELECT win_start, user_id, total, CAST(rk AS BIGINT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY win_start
                                   ORDER BY total DESC, user_id) AS rk
      FROM agg)
WHERE rk <= 3""",
)
def s_windowed_topk(spark, sf_dir):
    """Per-window top-k: daily tumbling window aggregation ranked within
    each window (the 'trending users' shape). In streaming execution this is
    the windowed-agg → rank-per-window composition run on window close; the
    batch form uses the same plan, and Spark's WindowGroupLimit pushes the
    k=3 cut below the final sort."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("win_start"), "user_id", "total")
    )
    wk = Window.partitionBy("win_start").orderBy(F.col("total").desc(), "user_id")
    return (
        agg.withColumn("rk", F.row_number().over(wk).cast("bigint"))
        .filter(F.col("rk") <= 3)
    )


@query(
    "s_rate_stats",
    oracle="""
WITH per_min AS (
  SELECT event_type, date_trunc('minute', ts) AS m, COUNT(*) AS n
  FROM events GROUP BY event_type, date_trunc('minute', ts)
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS peak_per_min,
       ROUND(AVG(n), 6) AS avg_per_min,
       CAST(COUNT(*) AS BIGINT) AS active_minutes
FROM per_min GROUP BY event_type""",
)
def s_rate_stats(spark, sf_dir):
    """Throughput profile per event type: peak and average events-per-minute
    over ACTIVE minutes (the capacity-planning readout a streaming ingest
    monitors). Two map-side-combinable groupBys; minute-cardinality
    intermediate."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    per_min = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("m")
    ).agg(F.count(F.lit(1)).alias("n"))
    return per_min.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("peak_per_min"),
        F.round(F.avg("n"), 6).alias("avg_per_min"),
        F.count(F.lit(1)).cast("bigint").alias("active_minutes"),
    )


@query(
    "s_session_stats",
    oracle="""
WITH seq AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
), grp AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM seq
), sessions AS (
  SELECT user_id, sid, COUNT(*) AS n_events,
         CAST(floor((epoch_ms(MAX(ts)) - epoch_ms(MIN(ts))) / 1000.0) AS BIGINT) AS duration_s
  FROM grp GROUP BY user_id, sid
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       -- explicit exact-int SUM / COUNT: AVG(BIGINT) may accumulate in
       -- double engine-side, which is summation-order-dependent at scale
       ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6) AS avg_events,
       ROUND(CAST(SUM(duration_s) AS DOUBLE) / COUNT(*), 6) AS avg_duration_s,
       ROUND(median(duration_s), 6) AS p50_duration_s,
       CAST(MAX(duration_s) AS BIGINT) AS max_duration_s
FROM sessions""",
)
def s_session_stats(spark, sf_dir):
    """Session-quality rollup: sessions built with the engine's 30-min-gap
    rule (gap >= 30 min starts a new session, matching session_window's
    end-inclusive semantics), then corpus-level duration/size statistics —
    the engagement readout layered on sessionization."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    seq = ev.select(
        "user_id",
        "ts",
        F.when(
            prev.isNull()
            # NTZ has no direct numeric cast; epoch MICROseconds via the LTZ
            # cast (wall-clock-preserving under the pinned UTC session TZ).
            # Full µs precision is required: a whole-second cast truncates
            # each endpoint and can misjudge a gap within 1s of the 30-min
            # boundary against the oracle's exact interval comparison
            # (one boundary session diverged at sf0.1).
            # STRICTLY greater: native session_window keeps an exactly-
            # 30:00 gap in ONE session (end-inclusive), as do the s_session
            # and s_stream_exec_session oracles — >= here would make the
            # repo's two session definitions disagree on exact ties
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(prev.cast("timestamp"))
                > 1800 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    wg = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    grp = seq.withColumn("sid", F.sum("new_s").over(wg))
    sessions = grp.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        # exact-ms difference floored once (truncating each endpoint to
        # seconds first would disagree with the oracle on sub-second gaps)
        F.floor(
            (
                F.max(F.unix_millis(F.col("ts").cast("timestamp")))
                - F.min(F.unix_millis(F.col("ts").cast("timestamp")))
            )
            / 1000.0
        )
        .cast("bigint")
        .alias("duration_s"),
    )
    return sessions.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        # exact integer sum, one double division — order-independent
        F.round(
            F.sum("n_events").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_events"),
        F.round(
            F.sum("duration_s").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_duration_s"),
        F.round(F.median("duration_s"), 6).alias("p50_duration_s"),
        F.max("duration_s").cast("bigint").alias("max_duration_s"),
    )


@query(
    "s_interval_join",
    oracle="""
SELECT c.event_id, c.user_id,
       CAST(COUNT(v.event_id) AS BIGINT) AS n_views,
       MAX(v.ts) AS last_view_ts
FROM events c
LEFT JOIN events v
  ON v.user_id = c.user_id AND v.event_type = 'view'
 AND v.ts > c.ts - INTERVAL 30 MINUTE AND v.ts <= c.ts
WHERE c.event_type = 'click'
GROUP BY c.event_id, c.user_id""",
)
def s_interval_join(spark, sf_dir):
    """Interval (stream-stream) join: every click joined to the views the
    same user made in the preceding 30 minutes — the attribution-window
    join that Structured Streaming runs as a watermarked stream-stream
    left-outer join with a time-bound condition (state eviction = the
    30-min bound + watermark). Batch-side it is a user_id equi-join with
    the range predicate evaluated post-probe; the equi-key keeps it
    hash/sort-merge partitioned, never a cross product. Reference parity:
    the reference's per-tx `find_one` probe loop (updatescript.py:62-67)
    is the degenerate 1-row version of exactly this join."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("c_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    return (
        clicks.join(
            views,
            (F.col("v_user") == F.col("user_id"))
            & (F.col("v_ts") > F.col("c_ts") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("v_ts") <= F.col("c_ts")),
            "left",
        )
        .groupBy("event_id", "user_id")
        .agg(
            F.count("v_id").alias("n_views"),
            F.max("v_ts").alias("last_view_ts"),
        )
    )


@query(
    "s_stream_exec_tumbling",
    oracle="""
SELECT date_trunc('day', ts) AS win_start,
       date_trunc('day', ts) + INTERVAL 1 DAY AS win_end,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS total
FROM events GROUP BY 1, 2""",
)
def s_stream_exec_tumbling(spark, sf_dir):
    """The one entry in the gate that EXECUTES as a stream, not batch-shaped
    SQL: readStream over the events fixture → withWatermark → tumbling
    window agg → complete-mode drain into a memory sink (streaming/
    structured.py). Complete mode + full drain means nothing is
    watermark-dropped, so the result is deterministic and hash-comparable
    to the same day-bucket SQL the batch s_tumbling uses."""
    import uuid

    from metrics_database_cron_script_spark.streaming.structured import (
        run_streaming_tumbling,
    )

    return run_streaming_tumbling(
        spark, sf_dir, query_name=f"s_exec_tumb_{uuid.uuid4().hex[:8]}"
    )


@query(
    "s_stream_exec_session",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS total
FROM sess GROUP BY user_id, sess_id""",
)
def s_stream_exec_session(spark, sf_dir):
    """Second genuinely-STREAM-EXECUTED gate entry: native `session_window`
    under readStream + watermark, complete-mode drained to a memory sink
    (streaming/structured.py run_streaming_session), hash-checked against
    the same DuckDB gaps-and-islands SQL that verifies the batch s_session —
    i.e., the stateful streaming operator and first-principles batch SQL
    must agree on every session boundary."""
    import uuid

    from metrics_database_cron_script_spark.streaming.structured import (
        run_streaming_session,
    )

    return run_streaming_session(
        spark, sf_dir, query_name=f"s_exec_sess_{uuid.uuid4().hex[:8]}"
    )


@query(
    "s_stream_exec_interval_join",
    oracle="""
SELECT a.event_id AS first_id, b.event_id AS next_id, a.user_id
FROM events a JOIN events b
  ON b.user_id = a.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 10 MINUTE""",
)
def s_stream_exec_interval_join(spark, sf_dir):
    """Third genuinely-STREAM-EXECUTED gate entry, and the first stream-
    STREAM one: a watermarked interval self-join (event → same-user
    follow-ups within 10 minutes) running as a real Structured Streaming
    query in append mode (streaming/structured.py
    run_streaming_interval_self_join — both sides watermarked so join
    state is bounded), drained to a memory sink and hash-checked against
    the batch interval-join SQL. Deterministic because inner-join matches
    are emitted as found within the drain; the watermark only bounds
    state."""
    import uuid

    from metrics_database_cron_script_spark.streaming.structured import (
        run_streaming_interval_self_join,
    )

    return run_streaming_interval_self_join(
        spark, sf_dir, query_name=f"s_exec_ssj_{uuid.uuid4().hex[:8]}"
    )


@query(
    "s_stream_exec_dedup",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n
FROM events GROUP BY event_type""",
)
def s_stream_exec_dedup(spark, sf_dir):
    """Fourth STREAM-EXECUTED gate entry: watermarked streaming
    dropDuplicates on (user_id, event_type) — dedup state that actually
    fires (the fixture has ~67 events per user across 5 types), unlike the
    event-id key where the fixture is already unique. The surviving row
    per pair is arrival-order-dependent, so the oracle checks the
    deterministic readout: per-type survivor counts = COUNT(DISTINCT
    user_id). Complete-mode drain to a memory sink
    (streaming/structured.py run_streaming_dedup)."""
    import uuid

    from metrics_database_cron_script_spark.streaming.structured import (
        run_streaming_dedup,
    )

    return run_streaming_dedup(
        spark,
        sf_dir,
        query_name=f"s_exec_dedup_{uuid.uuid4().hex[:8]}",
        subset=["user_id", "event_type"],
    )


@query(
    "s_stream_exec_enrich",
    oracle="""
WITH dim AS (
  SELECT CAST(ts AS DATE) AS date, ROUND(AVG(value), 6) AS price
  FROM events GROUP BY 1
)
SELECT d.date, COUNT(*) AS n, ROUND(SUM(e.value), 2) AS total
FROM events e JOIN dim d ON CAST(e.ts AS DATE) = d.date
GROUP BY d.date""",
)
def s_stream_exec_enrich(spark, sf_dir):
    """Fifth STREAM-EXECUTED gate entry, covering the stream-STATIC join:
    the P2 enrichment (tx stream ⋈ broadcast price dim,
    updatescript.py:64-82) running as a real Structured Streaming query —
    the static dim is re-resolved per micro-batch, which is how a
    slowly-changing dimension joins a live stream without restarts
    (streaming/structured.py run_streaming_enrichment). Complete-mode
    per-day rollup drain: every stream row joins exactly one price-day
    row, so the readout is deterministic and fully SQL-oracled."""
    import uuid

    from metrics_database_cron_script_spark.streaming.structured import (
        run_streaming_enrichment,
    )

    return run_streaming_enrichment(
        spark, sf_dir, query_name=f"s_exec_enrich_{uuid.uuid4().hex[:8]}"
    )


from metrics_database_cron_script_spark.plans.queries_reference import (
    REST_PRICE_PYDS_ORACLE as _REST_PRICE_PYDS_ORACLE,
)


@query("s_stream_exec_rest", oracle=_REST_PRICE_PYDS_ORACLE)
def s_stream_exec_rest(spark, sf_dir):
    """Sixth STREAM-EXECUTED gate entry (round-6 verdict item 3), closing
    the one modality the REST source lacked: the R6/R7 day-spine feed
    consumed through the Spark-4 Python DataSource STREAMING API
    (sources/pyds.py RestPointStreamReader — offsets are indices into the
    URL list, so restarts resume at the first unfetched day) instead of a
    one-shot batch read. Microbatches of 8 URLs drain append-mode into a
    memory sink via processAllAvailable; the result is hash-checked
    against the IDENTICAL md5-price oracle as the batch
    r_rest_price_dim_pyds — the two modalities of the source must agree
    byte-for-byte on every (day, price) row."""
    import uuid

    from pyspark.sql import functions as F

    from metrics_database_cron_script_spark.plans.queries_reference import (
        day_spine_urls,
    )
    from metrics_database_cron_script_spark.sources.pyds import (
        rest_point_stream,
    )

    prices = rest_point_stream(
        spark, day_spine_urls(spark, sf_dir), "$.market_data.current_price.usd"
    ).select("key", F.round("value", 2).alias("price"))
    name = f"s_exec_rest_{uuid.uuid4().hex[:8]}"
    q = (
        prices.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


from metrics_database_cron_script_spark.plans.queries_llm import (
    _MINHASH_PORTABLE_ORACLE as _MH_PORTABLE_ORACLE,
)


@query("s_stream_exec_neardup", oracle=_MH_PORTABLE_ORACLE)
def s_stream_exec_neardup(spark, sf_dir):
    """Seventh STREAM-EXECUTED gate entry, and the first CUSTOM STATEFUL
    one: MinHash+LSH near-dup with cross-batch bucket state via
    `applyInPandasWithState` (streaming/neardup.py). The documents fixture
    drains as 4 micro-batches; each LSH bucket keeps its membership in the
    state store, so a doc is compared only against earlier members of the
    buckets it lands in (the streaming twin of the P6 band-index probe).
    Signatures are computed per-row (array_min over md5-prefix transforms
    — no streaming agg), emission is order-independent (min,max) pairs,
    and verification joins the static doc store post-drain — so the live
    stateful execution is value-hash-checked against the IDENTICAL DuckDB
    oracle as the batch `x_near_dup_minhash_portable` pipeline.
    Reference parity: the updatescript.py:166-179 dedup guards, as
    arrival-time streaming state instead of a cron-batch anti-join."""
    import uuid

    from metrics_database_cron_script_spark.streaming.neardup import (
        run_streaming_neardup,
    )

    return run_streaming_neardup(
        spark, sf_dir, query_name=f"s_exec_ndup_{uuid.uuid4().hex[:8]}"
    )


@query(
    "s_stream_exec_stateful_totals",
    oracle="""
SELECT user_id, COUNT(*) AS n, MAX(ts) AS last_ts
FROM events GROUP BY user_id""",
)
def s_stream_exec_stateful_totals(spark, sf_dir):
    """Eighth STREAM-EXECUTED gate entry, second CUSTOM-STATEFUL one — the
    ACCUMULATOR shape (per-key running count/sum/max state) next to
    s_stream_exec_neardup's MEMBERSHIP shape: the events fixture staged as
    4 range-partitioned files drains through `applyInPandasWithState`
    running totals (streaming/stateful.py) one file per micro-batch, so
    per-user state is genuinely built across batches, and the final
    accumulators are value-hash-checked against the batch GROUP BY.
    Reference parity: the R15 loop-carried per-stash state
    (updatescript.py:175-186) generalized to arbitrary per-key
    accumulators maintained in the state store."""
    import uuid

    from metrics_database_cron_script_spark.streaming.stateful import (
        run_stateful_running_totals_multibatch,
    )

    return run_stateful_running_totals_multibatch(
        spark, sf_dir, query_name=f"s_exec_totals_{uuid.uuid4().hex[:8]}"
    )
