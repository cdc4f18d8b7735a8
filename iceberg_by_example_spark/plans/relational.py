"""Relational operator inventory: scans, filters, aggregations, joins.

Each query registers a PySpark plan plus its DuckDB oracle twin.
Reference parity notes cite /root/reference file:line for the operator
being re-expressed (SURVEY.md §2); the TPC-H-ish corpus stands in for
the reference's 50-row activity table so the same operators are
exercised at driver scale.

Scale notes (100 TB stance):
- Filters/projections are expressed declaratively so they reach the
  parquet scan (PushedFilters / ReadSchema — verified in tests).
- Dimension joins broadcast explicitly; fact-fact joins rely on
  sort-merge + AQE skew handling.
- Aggregates are map-side partial by construction (hash aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_by_example_spark.functions.exact import (
    davg,
    dec,
    dsum,
    dsum_dec,
    one_minus,
    one_plus,
)
from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table

# ---------------------------------------------------------------------------
# Scans / projections / filters  (reference S3/S4, P1-P4 — LT:107,114,130,149)
# ---------------------------------------------------------------------------


@register(
    "scan_projection_filter",
    oracle="""
    SELECT l_orderkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity >= 48.0
    """,
    category="scan",
    bench=True,
)
def scan_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate, both pushed into the parquet scan.

    Parity: reference P1/P2 (`IcebergLoadActivityTask.scala:114,130`)
    read `SELECT * ... WHERE txn_id='txn10'`; here the projection is a
    real column subset so ReadSchema shrinks to 4 of 11 columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_quantity") >= 48.0)
    ).select("l_orderkey", "l_quantity", "l_extendedprice")


@register(
    "point_lookup",
    oracle="SELECT * FROM orders WHERE o_orderkey = 7777",
    category="scan",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup on the key column (reference P2, LT:130: txn_id='txn10')."""
    return load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") == 7777)


@register(
    "conjunctive_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderstatus = 'F'
      AND o_orderdate >= CAST('1996-01-01' AS TIMESTAMP)
      AND o_orderdate <  CAST('1997-01-01' AS TIMESTAMP)
      AND o_totalprice > 400000.0
    """,
    category="scan",
)
def conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicate with a date cast (reference P3, LT:149)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_totalprice") > 400000.0)
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")


@register(
    "null_scan",
    oracle="""
    SELECT * FROM customer
    WHERE c_custkey IS NULL OR c_name IS NULL OR c_nationkey IS NULL
       OR c_acctbal IS NULL OR c_mktsegment IS NULL
    """,
    category="scan",
)
def null_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Any-column null audit, column-native (reference P5, WapIceberg.scala:70-75).

    The reference iterates `row.isNullAt(idx)` in a typed lambda; this
    OR-chain stays inside whole-stage codegen — the version that still
    vectorizes at 100 TB.
    """
    from iceberg_by_example_spark.sources.activity import rows_with_any_null

    return rows_with_any_null(load_table(spark, sf_dir, "customer"))


# ---------------------------------------------------------------------------
# Aggregations  (reference A1/A2 — LT:108, LT:125 — plus the §2.13 gap family)
# ---------------------------------------------------------------------------


@register(
    "agg_global_count",
    oracle="SELECT COUNT(*) AS cnt FROM lineitem",
    category="agg",
)
def agg_global_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global count (reference A1, LT:108/115)."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("cnt"))


@register(
    "agg_groupby_count",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders GROUP BY o_orderpriority
    """,
    category="agg",
    bench=True,
)
def agg_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash group-by + count — the reference's flagship query
    (A2, LT:125: `group by account`)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "agg_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))
               * (CAST(1 AS DECIMAL(1,0)) - CAST(l_discount AS DECIMAL(7,6)))) AS DECIMAL(27,6)) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))
               * (CAST(1 AS DECIMAL(1,0)) - CAST(l_discount AS DECIMAL(7,6)))
               * (CAST(1 AS DECIMAL(1,0)) + CAST(l_tax AS DECIMAL(7,6)))) AS DECIMAL(27,6)) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    category="agg",
    bench=True,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — the full sum/avg/count family
    (gap list §2.13; reference only has count). Exact-decimal sums keep
    the result bit-reproducible across engines and partitionings."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * one_minus("l_discount")
    charge = disc_price * one_plus("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_dec(disc_price).alias("sum_disc_price"),
            dsum_dec(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", scale=6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_minmax",
    oracle="""
    SELECT event_type,
           MIN(value) AS min_value, MAX(value) AS max_value,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    category="agg",
)
def agg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max are order-independent — safe on raw doubles."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count("*").alias("n"),
        )
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
           COUNT(DISTINCT l_partkey) AS distinct_parts
    FROM lineitem GROUP BY l_returnflag
    """,
    category="agg",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (gap §2.13). Spark expands this to a
    two-phase aggregate — partials still combine map-side."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("distinct_suppliers"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    category="agg",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("total"))
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    category="agg",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("qty"))
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    category="agg",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets via SQL — the engine exposes both DF and SQL entry
    points (reference drives everything through spark.sql too, §3)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# ---------------------------------------------------------------------------
# Joins (gap §2.13 — reference's only join is inside MERGE, LT:71)
# ---------------------------------------------------------------------------


@register(
    "join_broadcast_dims",
    oracle="""
    SELECT r.r_name AS region,
           COUNT(*) AS orders_n,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    category="join",
    bench=True,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join: fact (orders) against three broadcast dims.

    At 100 TB the fact side never shuffles for these joins — customer/
    nation/region ship to executors. Explicit `broadcast()` hints keep
    the plan stable if statistics are stale.
    """
    o = load_table(spark, sf_dir, "orders")
    c = F.broadcast(load_table(spark, sf_dir, "customer"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.count("*").alias("orders_n"), dsum("o_totalprice").alias("revenue"))
    )


@register(
    "join_sortmerge_facts",
    oracle="""
    SELECT o.o_orderstatus,
           COUNT(*) AS line_n,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(20,2))
                    * (CAST(1 AS DECIMAL(1,0)) - CAST(l.l_discount AS DECIMAL(7,6)))) AS DECIMAL(27,6)) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderstatus
    """,
    category="join",
    bench=True,
)
def join_sortmerge_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join (lineitem x orders): shuffle on the join key,
    sort-merge execution, AQE skew-split if a key is hot. The filter on
    orders is pushed below the join so the shuffled build side shrinks."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    revenue = dec("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("line_n"), dsum_dec(revenue).alias("revenue"))
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS order_n
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    category="join",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count=0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_n"))
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 500000.0)
    """,
    category="join",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having a big order. Semi avoids the
    row-multiplication a plain join + distinct would shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 500000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    category="join",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS customers
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS suppliers
                FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           COALESCE(cn.customers, 0) AS customers,
           COALESCE(sn.suppliers, 0) AS suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
    category="join",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregated sides (nation-level counts)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("suppliers"))
    )
    return c.join(s, "nk", "full").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("customers", F.lit(0)).alias("customers"),
        F.coalesce("suppliers", F.lit(0)).alias("suppliers"),
    )


@register(
    "join_cross_small",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
    category="join",
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny relations (5 x 3). Only ever sane when at
    least one side is broadcast-tiny — which it is here by construction."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    s = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(F.broadcast(s))


# ---------------------------------------------------------------------------
# Subqueries (gap §2.13)
# ---------------------------------------------------------------------------


@register(
    "subquery_in",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderstatus
    """,
    category="subquery",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_by_example_spark.sources.tpch import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        GROUP BY o_orderstatus
        """
    )


@register(
    "subquery_scalar",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE c_acctbal > 2 * (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) FROM customer)
    """,
    category="subquery",
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: customers with balance > 2x the global mean.
    The mean is computed exact-decimal so both engines derive the same
    double threshold."""
    from iceberg_by_example_spark.sources.tpch import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_acctbal > 2 * (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) FROM customer)
        """
    )


@register(
    "subquery_exists_correlated",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity = 50.0)
    """,
    category="subquery",
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_by_example_spark.sources.tpch import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity = 50.0)
        """
    )


@register(
    "subquery_lateral_topn",
    oracle="""
    SELECT r.r_name AS region, t.n_name AS nation
    FROM region r JOIN LATERAL (
      SELECT n_name FROM nation n
      WHERE n.n_regionkey = r.r_regionkey
      ORDER BY n_name LIMIT 2) t ON TRUE
    """,
    category="subquery",
)
def subquery_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated table subquery — top-N-per-outer-row in its
    declarative SQL form. Catalyst DECORRELATES it (the lateral
    LIMIT becomes a partitioned rank under the hood), so what looks
    like a per-row subquery executes as one join + window, never a
    nested loop — the planner shape this query pins, alongside the
    imperative window formulation in ``window_topk_per_group``."""
    from iceberg_by_example_spark.sources.tpch import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r.r_name AS region, t.n_name AS nation
        FROM region r JOIN LATERAL (
          SELECT n_name FROM nation n
          WHERE n.n_regionkey = r.r_regionkey
          ORDER BY n_name LIMIT 2) t
        """
    )
