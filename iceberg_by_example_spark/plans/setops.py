"""Set operations + sort/limit/top-k (gap §2.13; reference O1-O3).

The reference's only sort is the compaction sort-order
(`IcebergLoadActivityTask.scala:159`) and its only limit is the
schema-clone ``LIMIT 0`` (LT:48); here the full query-level family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table


@register(
    "set_union_all",
    oracle="""
    SELECT c_custkey AS key, c_name AS name, c_acctbal AS acctbal, 'customer' AS kind
    FROM customer
    UNION ALL
    SELECT s_suppkey AS key, s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind
    FROM supplier
    """,
    category="setop",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two conformed projections — no shuffle at all."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionAll(s)


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    category="setop",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — nations having both customers
    and suppliers. Executes as an aggregate + semi join."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    category="setop",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — nations with customers but no suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@register(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    category="sort",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans ORDER BY + LIMIT as TakeOrderedAndProject
    — per-partition heaps then a k-row merge, never a full sort."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "sort_multi_col",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
    ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey ASC LIMIT 20
    """,
    category="sort",
)
def sort_multi_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column mixed-direction sort with limit."""
    return (
        load_table(spark, sf_dir, "supplier")
        .orderBy(F.asc("s_nationkey"), F.desc("s_acctbal"), F.asc("s_suppkey"))
        .limit(20)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    category="setop",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — multiplicity = min of the two)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@register(
    "set_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    category="setop",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference — multiplicity-aware)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@register(
    "sample_deterministic",
    oracle=None,  # engine samplers differ by design; invariants in pytest
    category="setop",
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample — reproducible given the seed and input
    layout (same files, same split planning). The scalable way to build
    dev subsets of a 100 TB table: no shuffle, each task samples its
    split independently."""
    return (
        load_table(spark, sf_dir, "orders")
        .sample(fraction=0.1, seed=42)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
