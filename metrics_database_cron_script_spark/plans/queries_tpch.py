"""The remaining TPC-H query shapes (Q1..Q22 minus the six already in
``queries_relational``: Q3/Q7/Q10/Q12/Q14/Q18), adapted to the fixture
star schema (no ``partsupp`` table; no comment/phone/commit-date columns —
each adaptation keeps the *operator shape* that makes the query a classic:
Q1's wide single-scan agg, Q2's correlated-min, Q4's EXISTS, Q13's
outer-join histogram, Q17's per-group-avg correlated filter, Q19's
disjunctive join predicate, Q21's double-correlated EXISTS/NOT-EXISTS).

Reference parity: the reference engine (updatescript.py) has no TPC-H
surface; these are part of the §2.C "complete relational engine" claim.

Cross-engine float rules (registry docstring): money sums → round(2),
price*(1-disc) product sums → round(4), three-factor products → round(6),
ratios/avgs → round(6); int-valued computed cols cast to BIGINT both sides.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from metrics_database_cron_script_spark.plans.registry import query
from metrics_database_cron_script_spark.sources import load_table


@query(
    "c_tpch_q1_shape",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 4) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,10))), 6) AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
)
def c_tpch_q1_shape(spark, sf_dir):
    """TPC-H Q1 (pricing summary report): the canonical wide single-scan
    aggregate — one pass, eight aggregates, tiny group count. The whole
    query is one partial-agg + one exchange of ~6 groups; at 100 TB it is
    scan-bound, which is exactly what the shape is meant to test."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(28,10)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(28,10)")), 2)
            .cast("double")
            .alias("sum_base_price"),
            F.round(F.sum(disc_price.cast("decimal(28,10)")), 4)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum((disc_price * (1 + F.col("l_tax"))).cast("decimal(28,10)")), 6
            )
            .cast("double")
            .alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "c_tpch_q2_shape",
    oracle="""
WITH shipped AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type
FROM part p
JOIN shipped sh ON sh.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = sh.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE p.p_size = 25 AND p.p_type = 'SMALL' AND r.r_name = 'EUROPE'
  AND s.s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM shipped sh2
    JOIN supplier s2 ON s2.s_suppkey = sh2.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
    WHERE sh2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s.s_acctbal DESC, s.s_name, p.p_partkey LIMIT 20""",
)
def c_tpch_q2_shape(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier): correlated per-part MIN subquery.
    No partsupp table in the fixture, so the part↔supplier relation is the
    distinct (l_partkey, l_suppkey) pairs from lineitem and the "cost"
    being minimized is s_acctbal. De-correlated Spark-side as a window MIN
    over the part key — one shuffle, no per-part probe (the reference's
    N+1 find_one pattern, updatescript.py:62, is exactly what this avoids)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 25) & (F.col("p_type") == "SMALL")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    shipped = li.select("l_partkey", "l_suppkey").distinct()
    # European suppliers only, then the per-part window-min over acctbal.
    eu_supp = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pairs = shipped.join(eu_supp, shipped["l_suppkey"] == eu_supp["s_suppkey"])
    w = Window.partitionBy("l_partkey")
    best = pairs.withColumn("min_bal", F.min("s_acctbal").over(w)).filter(
        F.col("s_acctbal") == F.col("min_bal")
    )
    return (
        best.join(p, best["l_partkey"] == p["p_partkey"])
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(20)
    )


@query(
    "c_tpch_q4_shape",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority""",
)
def c_tpch_q4_shape(spark, sf_dir):
    """TPC-H Q4 (order priority checking): EXISTS with a cross-table
    predicate. The fixture has no commit/receipt dates, so "late" is a
    lineitem shipped >90 days after the order date. The correlated EXISTS
    becomes a left-semi join with the inequality folded into the join
    condition — the planner-native de-correlation."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "c_tpch_q5_shape",
    oracle="""
SELECT n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name""",
)
def c_tpch_q5_shape(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): the six-way join whose defining
    twist is the non-key equi-condition s_nationkey = c_nationkey (revenue
    only counts when supplier and customer share a nation). Dims broadcast;
    the only shuffle is orders⋈lineitem on the order key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nr = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
        "n_nationkey", "n_name"
    )
    sn = s.join(F.broadcast(nr), s["s_nationkey"] == nr["n_nationkey"]).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(
            sn,
            (sn["s_suppkey"] == li["l_suppkey"]) & (sn["s_nationkey"] == c["c_nationkey"]),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "c_tpch_q6_shape",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24""",
)
def c_tpch_q6_shape(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-aggregate,
    zero joins — the query that exists to prove conjunctive range predicates
    reach the scan (PushedFilters on shipdate/discount/quantity) and that a
    single global agg needs only a 1-row exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue")
    )


@query(
    "c_tpch_q8_shape",
    oracle="""
WITH vol AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / SUM(volume), 6) AS mkt_share
FROM vol GROUP BY o_year ORDER BY o_year""",
)
def c_tpch_q8_shape(spark, sf_dir):
    """TPC-H Q8 (national market share): nation role-playing — the nation
    dim joins twice (customer side filters the market region, supplier side
    feeds the share numerator), then a conditional-sum ratio per year."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cust_nation = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey")
    )
    supp_nation = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cust_nation, o["o_custkey"] == cust_nation["c_custkey"])
        .join(p, li["l_partkey"] == p["p_partkey"])
        .join(supp_nation, li["l_suppkey"] == supp_nation["s_suppkey"])
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "c_tpch_q9_shape",
    oracle="""
SELECT sn.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                 - p.p_retailprice * l.l_quantity), 4) AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC""",
)
def c_tpch_q9_shape(spark, sf_dir):
    """TPC-H Q9 (product-type profit): profit = revenue − cost per
    (supplier-nation, order-year). No partsupp.ps_supplycost in the fixture,
    so cost is p_retailprice * quantity (still a dim-sourced per-unit cost).
    The p_name LIKE filter prunes part before the join chain."""
    from metrics_database_cron_script_spark.sources.tables import inline_dim_map

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    # nation is constant-cardinality (25 rows at any SF): inlined as a
    # literal nationkey→name map instead of a pinned broadcast join — no
    # build job, no exchange, the lookup runs in the fact stage's codegen
    n_map = inline_dim_map(sf_dir, "nation", "n_nationkey", "n_name")
    # orders is FACT-sized (grows with lineitem): stats at fixture scale sit
    # under the auto-broadcast threshold, which would collect millions of
    # rows to the driver at real scale — pin shuffle-hash instead: both
    # sides shuffle on the orderkey, hash build per partition, no sort.
    # (Measured: 1.25 s → 0.69 s at the synthetic sf1, and no slower at
    # sf0.1; AQE's skew handling still applies to SHJ.)
    o = load_table(spark, sf_dir, "orders").hint("shuffle_hash")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    # Flat chain instead of pre-joining supplier⋈nation into a derived dim:
    # Catalyst collapses the whole chain into one fact-scan stage, and
    # nation reaches the agg through supplier's s_nationkey as an inlined
    # literal lookup. part/supplier carry NO broadcast hint — they grow
    # with scale factor, so the build strategy must stay stats-driven
    # (auto-broadcast under the threshold at fixture scale, graceful
    # shuffle beyond it).
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .withColumn("n_name", F.element_at(n_map, F.col("s_nationkey")))
        .filter(F.col("n_name").isNotNull())
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 4).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "c_tpch_q11_shape",
    oracle="""
WITH val AS (
  SELECT l.l_partkey, SUM(l.l_extendedprice * (1 - l.l_discount)) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name IN ('NATION_1', 'NATION_2')
  GROUP BY l.l_partkey
)
SELECT l_partkey, ROUND(value, 4) AS value
FROM val
WHERE value > (SELECT SUM(value) * 0.001 FROM val)
ORDER BY value DESC, l_partkey LIMIT 50""",
)
def c_tpch_q11_shape(spark, sf_dir):
    """TPC-H Q11 (important stock): group totals filtered against a scalar
    fraction of the grand total — the agg-vs-scalar-subquery shape. The
    grand total is a 1-row broadcast cross join, not a second scan of the
    base table (the grouped intermediate is reused)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    sn = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select("s_suppkey")
    val = (
        li.join(sn, li["l_suppkey"] == sn["s_suppkey"])
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    total = val.agg((F.sum("value") * 0.001).alias("threshold"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", F.round("value", 4).alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
        .limit(50)
    )


@query(
    "c_tpch_q13_shape",
    oracle="""
WITH c_orders AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
)
def c_tpch_q13_shape(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution): the outer-join
    histogram — LEFT JOIN with a predicate *inside* the join condition (so
    non-matching customers survive with count 0), grouped twice. Pushing
    the priority filter into the WHERE clause instead would silently drop
    the zero bucket; keeping it in the ON clause is the whole point."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(
        o,
        (o["o_custkey"] == c["c_custkey"]) & (o["o_orderpriority"] != "5-LOW"),
        "left",
    )
    counts = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .select(F.col("c_count").cast("bigint").alias("c_count"), "custdist")
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "c_tpch_q15_shape",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey""",
)
def c_tpch_q15_shape(spark, sf_dir):
    """TPC-H Q15 (top supplier): a derived view consumed twice — once for
    the MAX scalar, once for the equality probe. The grouped intermediate
    is computed once; the scalar max rides back as a broadcast, keeping it
    a single shuffle. Revenue is rounded *in the view* so the equality
    compares identical 4-decimal values on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("best"))
    return (
        revenue.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best"))
        .join(s, F.col("l_suppkey") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "c_tpch_q16_shape",
    oracle="""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size""",
)
def c_tpch_q16_shape(spark, sf_dir):
    """TPC-H Q16 (parts/supplier relationship): COUNT(DISTINCT) per
    three-column group with a NOT IN exclusion subquery. The exclusion list
    (negative-balance suppliers standing in for 'Customer Complaints') is a
    broadcast anti join; the distinct-count shuffles once on the group key."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .select(
            "p_brand",
            "p_type",
            F.col("p_size").cast("bigint").alias("p_size"),
            "supplier_cnt",
        )
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "c_tpch_q17_shape",
    oracle="""
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 6) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey
  )""",
)
def c_tpch_q17_shape(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): the per-group-average
    correlated filter — each lineitem compares against the mean quantity of
    its own part. De-correlated as a grouped-avg join (NOT a window over the
    filtered side: the average must be over *all* lineitems of the part,
    computed before the brand filter narrows the rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(avg_qty, li["l_partkey"] == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"))
    )


@query(
    "c_tpch_q19_shape",
    oracle="""
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 30
       AND l.l_quantity BETWEEN 20 AND 30)""",
)
def c_tpch_q19_shape(spark, sf_dir):
    """TPC-H Q19 (discounted revenue): the disjunction-of-conjunctions
    join predicate. Catalyst extracts the common p_partkey equi-key so the
    join stays hash-based with the OR evaluated as a post-join filter, and
    derives the brand IN-list as a pushed-down scan filter on part."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(20, 30)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


@query(
    "c_tpch_q20_shape",
    oracle="""
WITH heavy AS (
  SELECT l.l_suppkey
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'blue%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING SUM(l.l_quantity) > 50
)
SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
ORDER BY s.s_name""",
)
def c_tpch_q20_shape(spark, sf_dir):
    """TPC-H Q20 (potential part promotion): nested semi-join chain — an
    aggregated HAVING subquery (suppliers who moved >50 units of any one
    blue part in 1997) feeding an IN filter on the supplier dim. The
    grouped subquery shuffles on (suppkey, partkey); the IN becomes a
    left-semi against the distinct supplier keys."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("blue%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    heavy = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(heavy, s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
        .orderBy("s_name")
    )


@query(
    "c_tpch_q21_shape",
    oracle="""
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name LIMIT 20""",
)
def c_tpch_q21_shape(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting): the double-correlated
    EXISTS / NOT-EXISTS. A line qualifies when some *other* supplier has a
    line in the same order (EXISTS) but none of them shipped later
    (NOT EXISTS) — i.e. this supplier shipped last. De-correlated into
    window aggregates over the compact per-(order, supplier) frame instead
    of self-join probes:

      per (order, supp):  s_max   = max(shipdate)          [grouped agg]
      window over order:  m1      = max(s_max),  k = #supps with s_max = m1,
                          m2      = max(s_max | s_max < m1),  nsupp = #supps
      other_max(supp)     = m1 if (s_max < m1 or k >= 2) else m2

    EXISTS      ⟺  nsupp >= 2
    NOT EXISTS  ⟺  l1.shipdate >= other_max(supp)

    One shuffle on the order key replaces the O(n²) correlated probes; the
    same rewrite is how the 100 TB plan avoids two extra fact-fact joins."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    # An order's status is one value per orderkey, and the EXISTS/NOT-EXISTS
    # probes only ever compare lines of the SAME order — so restricting to
    # F-status orders up front (semi join once, before the window passes)
    # is semantics-preserving and halves the per-order window + join-back
    # work (TPC-H: ~49% of orders are 'F').
    from metrics_database_cron_script_spark.operators.partitioning import key_fan_out

    # One explicit exchange on l_orderkey feeds EVERYTHING downstream: the
    # per-(order, supp) aggregate and the order-window both cluster on a
    # key-subset of this partitioning, and the join-back's equi-keys
    # (orderkey, suppkey) are a superset — so Catalyst inserts no further
    # lineitem shuffle, and ReuseExchange shares the one shuffle between the
    # aggregate branch and the join-back branch instead of re-scanning.
    #
    # The explicit isNotNull filters exist to make that sharing REAL: the
    # join-back derives IsNotNull(l_suppkey)/IsNotNull(l_shipdate) and
    # pushes them into ITS copy of the scan only, so without them the two
    # subtrees canonicalize differently and ReuseExchange cannot fire —
    # lineitem is scanned, semi-joined and shuffled TWICE (measured plan,
    # plans/r11/c_tpch_q21_shape_before.txt ops (1)-(17)). Filtering the
    # shared input up front makes both branches' subtrees byte-identical.
    # Semantics: null join keys never survive the oracle's equi-joins, so
    # the key filters are always safe. The l_shipdate filter is semantics-
    # preserving ONLY because the fixture data is null-free (TPC-H NOT
    # NULL columns): under nullable data a NULL-shipdate l1 row makes the
    # NOT-EXISTS comparison vacuously true (it CAN be counted), and a
    # peer supplier whose lines all have NULL shipdates still satisfies
    # EXISTS — so on nullable inputs this filter would have to be revisited
    # to match oracle NULL semantics. (ADVICE r11, low.)
    li = key_fan_out(
        load_table(spark, sf_dir, "lineitem")
        .join(o, F.col("l_orderkey") == o["o_orderkey"], "left_semi")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .filter(
            F.col("l_orderkey").isNotNull()
            & F.col("l_suppkey").isNotNull()
            & F.col("l_shipdate").isNotNull()
        ),
        "l_orderkey",
    )
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("s_max")
    )
    # Both window passes share partitionBy(l_orderkey): one exchange + one
    # sort serve all five analytics (no join-back to order-level aggregates).
    w = Window.partitionBy("l_orderkey")
    lvl1 = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "s_max",
        F.max("s_max").over(w).alias("m1"),
        F.count(F.lit(1)).over(w).alias("nsupp"),
    )
    supp_stats = lvl1.select(
        F.col("l_orderkey").alias("ss_orderkey"),
        F.col("l_suppkey").alias("ss_suppkey"),
        "nsupp",
        F.when(
            (F.col("s_max") < F.col("m1"))
            | (
                F.sum((F.col("s_max") == F.col("m1")).cast("int")).over(w)
                >= 2
            ),
            F.col("m1"),
        )
        .otherwise(
            F.max(F.when(F.col("s_max") < F.col("m1"), F.col("s_max"))).over(w)
        )
        .alias("other_max"),
    )
    # merge hint: without it Catalyst BROADCASTS the windowed per-(order,
    # supp) intermediate (its size estimate sits under the auto-broadcast
    # threshold at fixture scale) — a fact-proportional driver collect that
    # dies at 100 TB. Pinning SMJ keeps the join on the existing
    # hashpartitioning(l_orderkey) (ClusteredDistribution satisfied on both
    # sides — no new exchange, just sorts), and is ~30% faster locally too.
    # (A shuffle_hash hint would be worse: shuffled-hash demands exact-key
    # co-partitioning and re-shuffles the full fact side on
    # (orderkey, suppkey).)
    qualified = li.join(
        supp_stats.hint("merge"),
        (li["l_orderkey"] == supp_stats["ss_orderkey"])
        & (li["l_suppkey"] == supp_stats["ss_suppkey"]),
    ).filter((F.col("nsupp") >= 2) & (li["l_shipdate"] >= F.col("other_max")))
    return (
        qualified.join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "c_tpch_q22_shape",
    oracle="""
WITH pos AS (
  SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0
)
SELECT right(c.c_name, 2) AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c.c_acctbal), 2) AS totacctbal
FROM customer c, pos
WHERE right(c.c_name, 2) IN ('13', '31', '23', '29', '30', '18', '17')
  AND c.c_acctbal > pos.avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
  )
GROUP BY cntrycode ORDER BY cntrycode""",
)
def c_tpch_q22_shape(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity): scalar-avg subquery + anti
    join + substring grouping. The fixture has no c_phone, so the "country
    code" is the last two digits of c_name. Above-average-balance customers
    with no orders at all, counted per code — the anti join is the only
    fact-sized operation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    code = F.expr("right(c_name, 2)")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.filter(code.isin("13", "31", "23", "29", "30", "18", "17"))
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy(code.alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
