"""Window-function inventory (gap §2.13 — absent from the reference).

Determinism: every ORDER BY inside a window frame ends in a unique key
so rank/lag/frame contents are total-ordered; frame sums over doubles
go through exact decimal (see functions.exact) so running totals match
the oracle bit-for-bit.

Scale: a window over ``partitionBy(k)`` shuffles once on k; we always
partition windows (never a global ORDER BY window without partition,
which would single-task at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table
from iceberg_by_example_spark.util import epoch_micros


@register(
    "window_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    category="window",
    bench=True,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price within each priority class — the
    grouped-top-k idiom (window + filter), one shuffle on the group key."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, event_type, value,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER w AS usecs_since_prev
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    category="window",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event sequencing: lag/lead + inter-event gap seconds."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (
            epoch_micros("ts") - F.lag(epoch_micros("ts")).over(w)
        ).alias("usecs_since_prev"),
    )


@register(
    "window_moving_agg",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(28,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3
    FROM events WHERE user_id < 10
    """,
    category="window",
)
def window_moving_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving sum per user (rows frame)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double").alias("moving_sum3"),
    )


@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders WHERE o_custkey < 100
    """,
    category="window",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer in order-date order."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(28,2)")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "window_rank_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           DENSE_RANK() OVER w AS bal_rank,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    category="window",
)
def window_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank family: dense_rank, ntile quartiles, percent_rank per segment."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.dense_rank().over(w).alias("bal_rank"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


@register(
    "window_value_family",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           FIRST_VALUE(c_custkey) OVER w AS richest_cust,
           LAST_VALUE(c_custkey) OVER (PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS poorest_cust,
           NTH_VALUE(c_custkey, 2) OVER w AS second_richest,
           CUME_DIST() OVER w AS bal_cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    category="window",
)
def window_value_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value + cume_dist per segment. last_value uses an
    explicit unbounded frame (the default frame stops at CURRENT ROW —
    the classic footgun, made explicit here and in the oracle)."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.first("c_custkey").over(w).alias("richest_cust"),
        F.last("c_custkey").over(w_full).alias("poorest_cust"),
        F.nth_value("c_custkey", 2).over(w).alias("second_richest"),
        F.cume_dist().over(w).alias("bal_cume"),
    )


@register(
    "window_time_range_agg",
    oracle="""
    SELECT user_id, event_id,
           COUNT(*) OVER w AS n_10m,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
             AS sum_10m
    FROM events WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(ts)
                 RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
    """,
    category="window",
)
def window_time_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: each event's count/sum over the
    trailing 10 minutes of ITS OWN user's activity — the frame shape
    ROWS windows can't express (a burst of 50 events in one minute is
    one frame; 3 sparse events over an hour are 3 small ones). The
    order key is epoch microseconds so the range bound is an exact
    integer in both engines; tied timestamps are frame PEERS — range
    semantics — making the result deterministic without a unique
    tiebreak column."""
    from iceberg_by_example_spark.util import epoch_micros

    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_micros("ts"))
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_10m"),
        F.sum(F.col("value").cast("decimal(28,6)"))
        .over(w)
        .cast("double")
        .alias("sum_10m"),
    )
