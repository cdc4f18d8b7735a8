"""Composite analytical queries — TPC-H-shaped multi-join pipelines
adapted to the driver corpus's columns. These are the "a user of the
reference could run their real reports here" set: each composes 3-6
operators (scan → filter → join×k → agg → having/top-k) in one plan so
Catalyst's join ordering, pushdown through joins, and partial
aggregation all get exercised together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_by_example_spark.functions.exact import (
    davg,
    dec,
    dsum,
    dsum_dec,
    one_minus,
)
from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table

_REVENUE_SQL = (
    "SUM(CAST(l_extendedprice AS DECIMAL(20,2))"
    " * (CAST(1 AS DECIMAL(1,0)) - CAST(l_discount AS DECIMAL(7,6))))"
)


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(CAST({_REVENUE_SQL} AS DECIMAL(27,6)) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
    category="analytics",
    bench=True,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: segment filter → 3-way join → revenue agg → top-10.
    The customer filter broadcasts; lineitem's shipdate filter pushes
    below the join."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = dec("l_extendedprice", 20, 2) * one_minus("l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum_dec(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(CAST({_REVENUE_SQL} AS DECIMAL(27,6)) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    category="analytics",
    bench=True,
)
def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: 6-way join with the local-supplier correlation
    (customer and supplier share a nation) — the join-order stress
    test. Dims broadcast; the two facts sort-merge on orderkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = dec("l_extendedprice", 20, 2) * one_minus("l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum_dec(revenue).alias("revenue"))
    )


@register(
    "tpch_q10_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(CAST({_REVENUE_SQL} AS DECIMAL(27,6)) AS DOUBLE) AS lost_revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue DESC, c.c_custkey LIMIT 20
    """,
    category="analytics",
)
def tpch_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returns, top-20 customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice", 20, 2) * one_minus("l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(dsum_dec(revenue).alias("lost_revenue"))
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(28,2))) > 180
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20
    """,
    category="analytics",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING over an aggregated join (large-quantity
    orders), top-20 by price."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 180)
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "tpch_q7_nation_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS ship_year,
           CAST(CAST({_REVENUE_SQL} AS DECIMAL(27,6)) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2') AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name, CAST(YEAR(l.l_shipdate) AS INT)
    """,
    category="analytics",
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations by ship
    year — a self-joined dimension (nation twice) plus a year derived
    grouping key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    nations = ["NATION_1", "NATION_2"]
    revenue = dec("l_extendedprice", 20, 2) * one_minus("l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .filter(
            F.col("supp_nation").isin(nations)
            & F.col("cust_nation").isin(nations)
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(dsum_dec(revenue).alias("volume"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))
                         * CAST(l_discount AS DECIMAL(7,6)))
                AS DECIMAL(27,6)) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND CAST(l_discount AS DECIMAL(7,6))
          BETWEEN CAST(0.05 AS DECIMAL(7,6)) AND CAST(0.07 AS DECIMAL(7,6))
      AND l_quantity < 24
    """,
    category="analytics",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: single-table scan-heavy aggregate — ALL predicates
    (date range, discount band, quantity cap) push into the parquet
    scan, the ideal pushdown showcase. The discount band compares in
    exact decimal on BOTH engines: a double BETWEEN would hinge on
    whether 0.05 parses to the same binary in each engine's literal
    grammar."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("0.05").cast("decimal(7,6)")
    hi = F.lit("0.07").cast("decimal(7,6)")
    disc = dec("l_discount", 7, 6)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (disc >= lo)
            & (disc <= hi)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum_dec(dec("l_extendedprice", 20, 2) * disc).alias("revenue")
        )
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    """,
    category="analytics",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: correlated EXISTS over the fact table → LEFT SEMI
    join, counted per priority class. The reference Q4 tests
    commit-vs-receipt lateness; this corpus carries neither column, so
    the late predicate is ship-lag > 90 days — same correlated-EXISTS
    plan shape (semi join keeps lineitem's payload out of the agg).

    The quarter filter prunes orders BEFORE the semi join; at 100 TB
    the semi join shuffles only (orderkey, orderdate) against
    lineitem's (orderkey, shipdate) projection."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (
                li.l_shipdate
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ),
            "left_semi",
        )
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@register(
    "tpch_q12_late_shipments",
    oracle="""
    SELECT CAST(YEAR(l.l_shipdate) AS INT) AS ship_year,
           -- CAST: DuckDB's integer SUM yields HUGEINT, hashed as
           -- float64 by the driver vs Spark's BIGINT — cast to match.
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY
    GROUP BY CAST(YEAR(l.l_shipdate) AS INT)
    """,
    category="analytics",
)
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional counting split by priority class over a
    fact-fact join with a non-equi residual (ship lag ≥ 30 days). The
    reference groups by l_shipmode (absent here); ship year is the
    stand-in grouping key. The CASE sums are map-side combinable — the
    shuffle carries (year, 2 longs) per partition, not rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                   THEN CAST(l.l_extendedprice AS DECIMAL(20,2))
                        * (CAST(1 AS DECIMAL(1,0)) - CAST(l.l_discount AS DECIMAL(7,6)))
                   ELSE CAST(0 AS DECIMAL(27,8)) END)
                AS DECIMAL(27,6)) AS DOUBLE)
           AS promo_revenue,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(20,2))
                         * (CAST(1 AS DECIMAL(1,0)) - CAST(l.l_discount AS DECIMAL(7,6))))
                AS DECIMAL(27,6)) AS DOUBLE)
           AS total_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    """,
    category="analytics",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promotion revenue share — CASE-gated aggregate over a
    fact⋈dim join (part broadcasts). Returns the two exact-decimal sums
    rather than their ratio: the ratio is one IEEE division the caller
    can do, and exposing both keeps every published column an exact
    aggregate. The corpus's p_type is single-token ('PROMO'), so the
    reference's LIKE 'PROMO%%' degenerates to equality."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = dec("l_extendedprice", 20, 2) * one_minus("l_discount")
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(27,8)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            dsum_dec(promo_rev).alias("promo_revenue"),
            dsum_dec(rev).alias("total_revenue"),
        )
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(20,2))
                         * (CAST(1 AS DECIMAL(1,0)) - CAST(l.l_discount AS DECIMAL(7,6))))
                AS DECIMAL(27,6)) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 50
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    category="analytics",
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunctive mixed-side predicate (brand/size from the
    dim, quantity from the fact) that can only be applied AFTER the
    join — Catalyst still pushes the derivable per-side implications
    (brand ∈ {…} onto part). The container/shipmode legs of the
    reference predicate don't exist in this corpus; size stands in."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#20") & sz.between(1, 50) & q.between(20, 30))
    )
    rev = dec("l_extendedprice", 20, 2) * one_minus("l_discount")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum_dec(rev).alias("revenue"))
    )


@register(
    "tpch_q22_dormant_customers",
    oracle="""
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(28,2))) AS DOUBLE)
               / COUNT(c2.c_acctbal)
        FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c.c_nationkey
    """,
    category="analytics",
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: well-funded customers gone dormant — an uncorrelated
    scalar subquery (average positive balance) gating an ANTI join
    against recent orders, aggregated per nation. (The reference
    derives country codes from c_phone, absent here, so c_nationkey is
    the grouping stand-in; and every customer in this corpus has SOME
    order, so dormant = no order since 1999 rather than never-ordered.)

    The scalar threshold is computed once and crossed in as a 1-row
    broadcast — NOT collected to the driver: the plan stays fully
    lazy/distributed and the threshold join is a BroadcastNestedLoop
    over exactly one row. The anti join shuffles only (custkey) from
    orders' side after projection."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("_avg_bal")
    )
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


@register(
    "events_funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id)
    SELECT 1 AS step, 'view' AS event_type,
           (SELECT COUNT(*) FROM s1) AS users
    UNION ALL
    SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
    """,
    category="analytics",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel (view → click → purchase): a user
    converts at step k only with an event strictly after their step-k-1
    conversion time.  The classic product-analytics sequence query.

    Spark-first shape: each step is a per-user conditional MIN —
    map-side combinable, one shuffle on user_id — and consecutive
    steps meet in a user_id equi-join that AQE plans as broadcast once
    the funnel narrows (step relations only shrink).  The step counts
    union into one 3-row result; nothing is collected."""
    ev = load_table(spark, sf_dir, "events")

    def first_after(df: DataFrame, etype: str, prev: DataFrame | None,
                    prev_t: str, out_t: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype).select("user_id", "ts")
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(prev_t))
        return e.groupBy("user_id").agg(F.min("ts").alias(out_t))

    s1 = first_after(ev, "view", None, "", "t1")
    s2 = first_after(ev, "click", s1, "t1", "t2")
    s3 = first_after(ev, "purchase", s2, "t2", "t3")

    def step(k: int, etype: str, s: DataFrame) -> DataFrame:
        return s.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(k).alias("step"),
            F.lit(etype).alias("event_type"),
            "users",
        )

    return (
        step(1, "view", s1)
        .unionByName(step(2, "click", s2))
        .unionByName(step(3, "purchase", s3))
    )


@register(
    "tpch_q13_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    category="analytics",
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape (customer order-count distribution; the reference
    corpus has no o_comment, so the excluded class is urgent-priority
    orders): LEFT join so zero-order customers survive with c_count=0,
    then a distribution over the counts. Two shuffles total — the
    outer join on custkey, then a tiny agg on c_count (the distinct
    count values number in the dozens at any scale)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(CAST({_REVENUE_SQL} AS DECIMAL(27,6)) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    category="analytics",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: quarterly revenue per supplier, return the max-revenue
    supplier(s). The scalar-max subquery becomes a 1-row broadcast
    joined back against the revenue relation — the agg runs once, not
    per-row, and the exact-decimal revenue makes the equality
    deterministic (a double sum would make 'the max' engine-dependent
    in the last ulp)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue_expr = dec("l_extendedprice", 20, 2) * one_minus("l_discount")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum_dec(revenue_expr).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    top = (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("supplier_no", "total_revenue")
    )
    return (
        s.join(F.broadcast(top), s.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH thresholds AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)
                    / COUNT(l_quantity)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(20,2)))
                AS DECIMAL(27,6)) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN thresholds t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13' AND p.p_type = 'SMALL'
      AND l.l_quantity < t.qty_threshold
    """,
    category="analytics",
)
def tpch_q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q17 shape (p_container doesn't exist here; p_type stands in):
    revenue lost to small-quantity orders of one brand. The correlated
    AVG subquery decorrelates into a per-part aggregate joined back on
    partkey — at scale that's one extra shuffle over (partkey, stats)
    instead of a per-row subquery, and the part filter broadcasts into
    both sides. The threshold mean is the exact quantized sum / count,
    so the strict `<` boundary falls identically in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#13") & (F.col("p_type") == "SMALL")
    )
    thresholds = li.groupBy("l_partkey").agg(
        (0.2 * davg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                F.sum(dec("l_extendedprice", 20, 2))
                .cast("decimal(27,6)")
                .cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
    WITH volumes AS (
      SELECT YEAR(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(20,2))
               * (CAST(1 AS DECIMAL(1,0))
                  - CAST(l.l_discount AS DECIMAL(7,6))) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01')
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_9'
                              THEN volume ELSE CAST(0 AS DECIMAL(20,2)) END)
                AS DECIMAL(27,6)) AS DOUBLE)
             / CAST(CAST(SUM(volume) AS DECIMAL(27,6)) AS DOUBLE)
             AS mkt_share
    FROM volumes
    GROUP BY o_year
    ORDER BY o_year
    """,
    category="analytics",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one supplier nation's share of ASIA-customer STANDARD
    part revenue, by order year. Eight-way join where every dimension
    broadcasts and only lineitem-orders shuffles; the share is a
    conditional-sum / sum over the identical exact-decimal volume, with
    the double division applied once per year-group at the very end."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load_table(spark, sf_dir, "supplier")
    volume = dec("l_extendedprice", 20, 2) * one_minus("l_discount")
    volumes = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    nation_volume = F.when(
        F.col("supp_nation") == "NATION_9", F.col("volume")
    ).otherwise(F.lit(0).cast("decimal(20,2)"))
    return (
        volumes.groupBy("o_year")
        .agg(
            dsum_dec(nation_volume).alias("nation_rev"),
            dsum_dec(F.col("volume")).alias("total_rev"),
        )
        .select(
            "o_year",
            (F.col("nation_rev") / F.col("total_rev")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q9_profit_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation,
           YEAR(o.o_orderdate) AS o_year,
           CAST(CAST({_REVENUE_SQL} AS DECIMAL(27,6)) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    category="analytics",
    bench=True,
)
def tpch_q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (no ps_supplycost table exists, so profit reduces to
    discounted revenue): profit on one product line by supplier nation
    and order year. The p_name LIKE filter can't push into a join key —
    it prunes the broadcast part relation instead, and AQE sees the
    shrunken build side. lineitem-orders is the only exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    )
    o = load_table(spark, sf_dir, "orders")
    profit = dec("l_extendedprice", 20, 2) * one_minus("l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum_dec(profit).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id),
    active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT f.cohort_day,
           CAST(DATEDIFF('day', f.cohort_day, a.d) AS INT) AS day_offset,
           COUNT(*) AS active_users
    FROM active a JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
    category="analytics",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each later day they return — the other canonical product-
    analytics query besides the funnel.

    Shape: one (user, day) distinct (map-side combinable), one per-user
    MIN, then a user-keyed join whose right side is |users| rows —
    broadcast-eligible under AQE well past any real user count — and a
    final small agg on (cohort, offset). The events table is scanned
    once per branch, never joined to itself row-for-row."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    active = ev.distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("d", "cohort_day").alias("day_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )


@register(
    "tpch_q11_important_parts",
    oracle=f"""
    WITH val AS (
      SELECT l.l_partkey AS p_partkey,
             CAST({_REVENUE_SQL} AS DECIMAL(27,6)) AS v
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY 1),
    tot AS (SELECT CAST(SUM(v) AS DECIMAL(30,6)) AS t,
                   COUNT(*) AS n_parts FROM val)
    SELECT val.p_partkey, CAST(val.v AS DOUBLE) AS part_value
    FROM val CROSS JOIN tot
    WHERE val.v * tot.n_parts > 2 * tot.t
    """,
    category="analytics",
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (adapted — this corpus has no partsupp, so "value" is
    a part's discounted lineitem revenue through one nation's
    suppliers): per-group value vs a global threshold. The group agg's
    1-row grand total joins back as a broadcast — never a driver-side
    collect. TPC-H pins its fraction to 0.0001/SF because a fixed
    fraction empties as the corpus grows; here the threshold is
    SCALE-FREE — keep parts above 2× the mean part value
    (``v * n_parts > 2 * total``) — and the compare stays in DECIMAL
    × integer (exact in both engines); only the reported value casts
    to double."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    revenue = dec("l_extendedprice") * one_minus("l_discount")
    val = (
        li.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(revenue).cast("decimal(27,6)").alias("v"))
    )
    tot = val.agg(
        F.sum("v").cast("decimal(30,6)").alias("t"),
        F.count("*").alias("n_parts"),
    )
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("v") * F.col("n_parts") > 2 * F.col("t"))
        .select("p_partkey", F.col("v").cast("double").alias("part_value"))
    )


@register(
    "tpch_q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_size IN (1, 4, 7, 10, 13)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    category="analytics",
)
def tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (adapted — supplier/part relationships come from
    lineitem instead of partsupp, and the "complaints" exclusion is
    suppliers with negative balance): filtered dims → anti-join the
    excluded-supplier set → COUNT(DISTINCT) per (brand, type, size).
    The excluded set and the part dim broadcast; the distinct-agg is
    Spark's two-phase partial_count(distinct …) — the shuffle carries
    (group key, suppkey) pairs, already locally deduped."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & F.col("p_size").isin(1, 4, 7, 10, 13)
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH flagged AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2),
    per_order AS (
      SELECT l_orderkey, COUNT(*) AS n_supp,
             CAST(SUM(is_late) AS BIGINT) AS n_late
      FROM flagged GROUP BY 1)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM flagged f
    JOIN per_order p ON f.l_orderkey = p.l_orderkey
    JOIN supplier s ON f.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE f.is_late = 1 AND p.n_supp > 1 AND p.n_late = 1
      AND n.n_name = 'NATION_3'
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    category="analytics",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (adapted: lateness = shipped >60 days after the order
    date, since this corpus has no receipt/commit dates): suppliers who
    were the ONLY late supplier on a multi-supplier order. The classic
    EXISTS / NOT EXISTS pair is reformulated as two aggregations —
    per-(order, supplier) late flags, then per-order supplier/late
    counts — turning correlated subqueries into one extra groupBy and
    an equi-join; at scale that's two partial-agg shuffles on orderkey
    instead of two more lineitem self-joins. Ties broken on s_name for
    a deterministic top-10."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    late = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        1,
    ).otherwise(0)
    flagged = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("is_late").cast("long").alias("n_late"),
    )
    nat_sup = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    return (
        flagged.filter(F.col("is_late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(nat_sup), flagged.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


_Q2_SQL = """
WITH eursup AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'),
cost AS (
  SELECT l.l_partkey, l.l_suppkey,
         MIN(l.l_extendedprice * (1 - l.l_discount)) AS supply_cost
  FROM lineitem l
  JOIN eursup e ON l.l_suppkey = e.s_suppkey
  GROUP BY 1, 2)
SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
       c.supply_cost
FROM part p
JOIN cost c ON c.l_partkey = p.p_partkey
JOIN eursup e ON c.l_suppkey = e.s_suppkey
WHERE p.p_size IN (5, 15, 25, 35, 45)
  AND p.p_type IN ('LARGE', 'SMALL')
  AND c.supply_cost = (SELECT MIN(c2.supply_cost) FROM cost c2
                       WHERE c2.l_partkey = p.p_partkey)
"""


@register(
    "tpch_q2_min_cost_supplier",
    oracle=_Q2_SQL,
    category="analytics",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (adapted — no partsupp in this corpus, so a part's
    "supply cost" through a supplier is the minimum discounted price
    the supplier has ever shipped it at): for each qualifying part,
    the EU supplier(s) offering the region-wide minimum cost — the
    classic CORRELATED SCALAR SUBQUERY over a join
    (``supply_cost = (SELECT MIN(...) WHERE partkey = outer.partkey)``).

    Deliberately expressed in SQL, correlated form intact: Catalyst
    decorrelates it into a per-part MIN aggregate re-joined on
    partkey — the same plan one would hand-write, but the correlated
    spelling exercises the subquery planner (RewriteCorrelatedScalarSubquery)
    end to end. MIN over per-row doubles is order-independent, so the
    cost and the equality compare are exact in both engines; ties
    (several suppliers at the minimum) are all returned, as in TPC-H.
    Scale shape: nation/region broadcast into supplier; the lineitem
    agg shuffles on (partkey, suppkey); the per-part MIN is a second,
    narrower partial agg of the first's output — no lineitem re-scan."""
    from iceberg_by_example_spark.sources.tpch import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q2_SQL)


_Q20_SQL = """
SELECT s.s_name, s.s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
    SELECT l.l_suppkey FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'small %')
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING SUM(l.l_quantity) > 0.5 * (
        SELECT SUM(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
          AND l2.l_suppkey = l.l_suppkey))
  AND s.s_nationkey IN (SELECT n_nationkey FROM nation
                        WHERE n_name IN ('NATION_1', 'NATION_4'))
"""


@register(
    "tpch_q20_concentrated_suppliers",
    oracle=_Q20_SQL,
    category="analytics",
)
def tpch_q20_concentrated_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q20 shape (adapted — availqty doesn't exist without partsupp,
    so the "excess stock" predicate becomes a shipping-concentration
    one: more than half of a (supplier, part)'s all-time shipped
    quantity moved within 1996): suppliers in two nations who
    concentrated shipments of any 'small *' part into that year — the
    classic NESTED IN-CHAIN (supplier IN → lineitem group IN → part)
    with a CORRELATED AGGREGATE inside the HAVING.

    Deliberately expressed in SQL with the nesting intact: Catalyst
    turns the IN chains into left-semi joins and decorrelates the
    HAVING's scalar aggregate into a per-(supplier, part) join —
    exercising both untested subquery-planner paths at once. Quantities
    are integral doubles, so both engines' sums are exact regardless
    of reduction order and the 0.5× compare is deterministic.
    Scale shape: the part filter semi-joins (broadcast) below the
    lineitem agg; the correlated total is a second agg over the same
    shuffle key (partkey, suppkey) — co-partitioned, no extra lineitem
    scan pattern; supplier is only semi-joined at the top."""
    from iceberg_by_example_spark.sources.tpch import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q20_SQL)


# ---------------------------------------------------------------------------
# Gap-based sessionization (batch twin of stream_session_window)
# ---------------------------------------------------------------------------

# Inactivity gap that closes a session. 30 minutes is the classic web-
# analytics convention; the value is shared with the oracle via this
# constant so both engines cut sessions at the identical boundary.
SESSION_GAP_S = 1800


@register(
    "events_user_sessions",
    bench=True,
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev
      FROM events),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev IS NULL
                    OR EPOCH_US(ts) - EPOCH_US(prev)
                       > {SESSION_GAP_S} * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM o),
    sess AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_idx
      FROM flagged)
    SELECT user_id, session_idx,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           (EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts))) // 1000000
             AS duration_s
    FROM sess GROUP BY user_id, session_idx
    """,
    category="analytics",
)
def events_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the batch event log: a session is
    a maximal run of a user's events with no ``SESSION_GAP_S`` gap —
    the lag-flag-cumsum idiom, the batch twin of
    ``stream_session_window``'s state-store sessions (that one merges
    windows as events ARRIVE; this one cuts the completed log).

    Scale shape: ONE shuffle. The lag, the running session counter,
    and the per-session aggregate are all keyed by user_id, so
    Catalyst plans a single exchange on user_id and the final
    groupBy(user_id, session_idx) reuses the window's partitioning
    (no second shuffle; the sort is per-partition). Skewed power
    users bound the partition, not the cluster — a user's events must
    be co-located for ANY sessionization, so user_id is the minimal
    correct key."""
    from iceberg_by_example_spark.util import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_S * 1_000_000
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(order).isNull()
            | (
                epoch_micros("ts") - epoch_micros(F.lag("ts").over(order))
                > gap_us
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.select(
        "user_id", "ts", F.sum("is_new").over(run).alias("session_idx")
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.floor(
            (epoch_micros(F.max("ts")) - epoch_micros(F.min("ts")))
            / 1_000_000
        ).alias("duration_s"),
    )


@register(
    "events_rolling_active_users",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    cover AS (
      SELECT UNNEST(GENERATE_SERIES(d, d + INTERVAL 6 DAY,
                                    INTERVAL 1 DAY))::DATE AS w_day,
             user_id
      FROM daily),
    days AS (SELECT DISTINCT d FROM daily)
    SELECT c.w_day AS day,
           COUNT(DISTINCT c.user_id) AS rolling_7d_users
    FROM cover c JOIN days ON days.d = c.w_day
    GROUP BY c.w_day
    """,
    category="analytics",
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — the DAU/WAU shape every
    product dashboard runs, which windows canNOT express (COUNT
    DISTINCT is not a window aggregate in any engine): each (day,
    user) observation COVERS the next 7 report days via an exploded
    date sequence, and the rolling distinct becomes a plain
    count_distinct per covered day. Days with no events of their own
    are excluded from the report (semi-join on observed days), like
    a dashboard that only plots days with traffic.

    Scale shape: dedupe to (day, user) FIRST (the big shrink — raw
    events collapse to at most users×days rows), then a bounded 7×
    explode, then one distinct aggregate partitioned by day. No
    self-join over the event log, no window over distincts."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    cover = daily.select(
        F.explode(
            F.sequence(
                F.col("d"),
                F.date_add(F.col("d"), 6),
            )
        ).alias("day"),
        "user_id",
    )
    days = daily.select(F.col("d").alias("day")).distinct()
    return (
        cover.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("rolling_7d_users"))
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH perm AS (
      SELECT event_type, DATE_TRUNC('minute', ts) AS m,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type,
             COUNT(*) AS n_minutes,
             CAST(SUM(n) AS DOUBLE) AS s1,
             CAST(SUM(n * n) AS DOUBLE) AS s2
      FROM perm GROUP BY event_type)
    SELECT p.event_type, p.m AS minute, p.n,
           (p.n - s.s1 / s.n_minutes)
             / SQRT(s.s2 / s.n_minutes
                    - (s.s1 / s.n_minutes) * (s.s1 / s.n_minutes))
             AS zscore
    FROM perm p JOIN stats s USING (event_type)
    WHERE s.n_minutes > 1
      AND s.s2 / s.n_minutes
            - (s.s1 / s.n_minutes) * (s.s1 / s.n_minutes) > 0
      AND ABS((p.n - s.s1 / s.n_minutes)
              / SQRT(s.s2 / s.n_minutes
                     - (s.s1 / s.n_minutes) * (s.s1 / s.n_minutes)))
          > 3
    """,
    category="analytics",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: per event type, minutes whose event
    count sits more than 3σ from that type's own mean rate — the
    monitoring query behind every traffic alert. Moments (n, Σx, Σx²)
    accumulate as exact integers and convert to double once, so mean/
    variance/z are fixed IEEE expressions of identical inputs in both
    engines (population variance — σ of the observed window, the
    monitoring convention).

    Scale shape: two stacked partial aggregates (minute buckets, then
    per-type moments — the second input is minutes, not events) and a
    broadcast-sized join back: per-type stats are one row per type."""
    ev = load_table(spark, sf_dir, "events")
    per_min = ev.groupBy(
        "event_type",
        F.date_trunc("minute", F.col("ts").cast("timestamp"))
        .cast(ev.schema["ts"].dataType)
        .alias("minute"),
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = per_min.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_minutes"),
        F.sum("n").cast("double").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n_minutes")
    var = F.col("s2") / F.col("n_minutes") - mean * mean
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        per_min.join(stats, "event_type")
        .filter((F.col("n_minutes") > 1) & (var > 0) & (F.abs(z) > 3))
        .select("event_type", "minute", "n", z.alias("zscore"))
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events)
    SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
    FROM seq WHERE prev IS NOT NULL
    GROUP BY prev, event_type
    """,
    category="analytics",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-to-event transition counts per user journey (the Markov
    matrix behind 'what do users do after X' product questions): one
    lag window keyed on user_id, then a global count per (from, to)
    pair. Ties on ts break on event_id so the sequence — and the
    matrix — is deterministic.

    Scale shape: one exchange on user_id for the lag, then a
    map-side-combinable count over ≤ |types|² keys; the matrix is
    tiny regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    )
    return (
        seq.filter(F.col("prev").isNotNull())
        .groupBy(
            F.col("prev").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
