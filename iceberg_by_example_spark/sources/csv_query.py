"""CSV source parity query (reference S1, LT:51-63).

The driver corpus is parquet-only, so this query round-trips a table
through CSV — write with header, read back with an *explicit* schema
(the reference's pattern: inferSchema is dead config there, LT:53-54,
and schema inference is an extra full scan nobody wants at 100 TB) —
then aggregates. The oracle reads the original parquet: if the CSV
reader mangled types or values, the hashes diverge.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_by_example_spark.functions.exact import dsum
from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table
from iceberg_by_example_spark.util import detach

SUPPLIER_SCHEMA = (
    "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double"
)


@register(
    "json_source_roundtrip",
    oracle="""
    SELECT n_regionkey,
           COUNT(*) AS n,
           MIN(n_name) AS first_nation
    FROM nation GROUP BY n_regionkey
    """,
    category="source",
)
def json_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → JSON-lines → explicit-schema JSON read → aggregate
    (same oracle-checked round-trip pattern as CSV, for the second
    text format a lake ingests)."""
    nation = load_table(spark, sf_dir, "nation")
    out = tempfile.mkdtemp(prefix="json_roundtrip_")
    try:
        nation.write.mode("overwrite").json(out)
        back = (
            spark.read.format("json")
            .schema("n_nationkey int, n_name string, n_regionkey int")
            .load(out)
        )
        result = back.groupBy("n_regionkey").agg(
            F.count("*").alias("n"), F.min("n_name").alias("first_nation")
        )
        return detach(result)
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "csv_source_roundtrip",
    oracle="""
    SELECT s_nationkey,
           COUNT(*) AS n,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS total_bal
    FROM supplier GROUP BY s_nationkey
    """,
    category="source",
)
def csv_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → CSV (header) → explicit-schema CSV read → aggregate."""
    supplier = load_table(spark, sf_dir, "supplier")
    out = tempfile.mkdtemp(prefix="csv_roundtrip_")
    try:
        supplier.write.mode("overwrite").option("header", "true").csv(out)
        back = (
            spark.read.format("csv")
            .option("header", "true")
            .schema(SUPPLIER_SCHEMA)
            .load(out)
        )
        result = back.groupBy("s_nationkey").agg(
            F.count("*").alias("n"), dsum("s_acctbal").alias("total_bal")
        )
        return detach(result)
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "orc_source_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS total_bal
    FROM customer GROUP BY c_mktsegment
    """,
    category="source",
)
def orc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → ORC → ORC read → aggregate: the third lake format
    Spark ships a native vectorized reader for (the columnar
    alternative where an existing warehouse is ORC-based). Same
    round-trip pattern as the CSV/JSON sources."""
    customer = load_table(spark, sf_dir, "customer")
    out = tempfile.mkdtemp(prefix="orc_roundtrip_")
    try:
        customer.select("c_custkey", "c_mktsegment", "c_acctbal").write.mode(
            "overwrite"
        ).orc(out)
        back = spark.read.format("orc").load(out)
        result = back.groupBy("c_mktsegment").agg(
            F.count("*").alias("n"), dsum("c_acctbal").alias("total_bal")
        )
        return detach(result)
    finally:
        shutil.rmtree(out, ignore_errors=True)
