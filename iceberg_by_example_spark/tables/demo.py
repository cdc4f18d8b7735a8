"""Registry queries exercising VersionedTable semantics against the
DuckDB oracle.

MERGE and branch reads aren't DuckDB operations, but their *results*
are SQL-expressible (a merge's final state is a full-outer-join
projection; a branch count is a filtered count), so these queries run
the real engine operators and let the oracle check the outcome —
stronger than the rows-only fallback.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table
from iceberg_by_example_spark.tables.versioned import VersionedTable
from iceberg_by_example_spark.util import detach

ORDERS_DDL = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


@register(
    "merge_upsert",
    oracle="""
    WITH target AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
         src AS (SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                        o_totalprice + 1000.0 AS o_totalprice,
                        o_orderdate, o_orderpriority
                 FROM orders WHERE o_orderkey % 3 = 0)
    SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           COALESCE(s.o_custkey, t.o_custkey) AS o_custkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
                ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                ELSE t.o_totalprice END AS o_totalprice,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderdate
                ELSE t.o_orderdate END AS o_orderdate,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderpriority
                ELSE t.o_orderpriority END AS o_orderpriority
    FROM target t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
    """,
    category="versioned",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (reference M1, LT:68-76) through the real
    VersionedTable engine: even-keyed orders as the table state, every
    third order (status→'U', price+1000) as the upsert source."""
    orders = load_table(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 2 == 0)
    src = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    loc = tempfile.mkdtemp(prefix="merge_upsert_")
    shutil.rmtree(loc)
    t = VersionedTable.create(spark, loc, schema=ORDERS_DDL)
    try:
        t.append(target)
        t.merge(src, on="o_orderkey")
        # pin to executor storage before the backing files are removed
        return detach(t.read())
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@register(
    "versioned_branch_counts",
    oracle="""
    SELECT 'v1' AS branch, COUNT(*) AS cnt FROM orders WHERE o_orderkey < 5000
    UNION ALL
    SELECT 'main' AS branch, COUNT(*) AS cnt FROM orders
    """,
    category="versioned",
)
def versioned_branch_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch creation + time-travel reads (reference D5/T1): load part
    of orders, branch 'v1', append the rest to main, then count each
    ref — v1 must still see only the first snapshot."""
    orders = load_table(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="branch_counts_")
    shutil.rmtree(loc)
    t = VersionedTable.create(spark, loc, schema=ORDERS_DDL)
    try:
        t.append(orders.filter(F.col("o_orderkey") < 5000))
        t.create_branch("v1")
        t.append(orders.filter(F.col("o_orderkey") >= 5000))
        rows = [
            ("v1", t.read(branch="v1").count()),
            ("main", t.read().count()),
        ]
        return spark.createDataFrame(rows, "branch string, cnt long")
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@register(
    "versioned_metadata_tables",
    oracle=None,  # snapshot ids/timestamps are run-specific; shape checked
    category="versioned",
)
def versioned_metadata_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-table scans (reference S5/W2, LT:84-97): build a small
    table with two commits and a branch, then summarize all the
    suffixed metadata relations the reference queries — snapshots /
    history / files / refs / manifests / metadata_log_entries — plus
    per-operation totals."""
    orders = load_table(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="meta_tables_")
    shutil.rmtree(loc)
    t = VersionedTable.create(spark, loc, schema=ORDERS_DDL)
    try:
        t.append(orders.filter(F.col("o_orderkey") < 1000))
        t.create_branch("audit")
        t.append(orders.filter(F.col("o_orderkey") >= 1000))
        ops = {
            r["operation"]: r["cnt"]
            for r in t.snapshots()
            .groupBy("operation")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        rows = [
            ("snapshots", t.snapshots().count()),
            ("history_depth", t.history().count()),
            ("files", t.files().count()),
            ("refs", t.refs().count()),
            ("manifests", t.manifests().count()),
            ("metadata_log_entries", t.metadata_log_entries().count()),
            ("append_commits", ops.get("append", 0)),
        ]
        return spark.createDataFrame(rows, "metric string, value long")
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@register(
    "delete_where",
    oracle="""
    SELECT * FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 100000.0)
    """,
    category="versioned",
)
def delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE WHERE through the real engine (reference G2 declares
    copy-on-write deletes but never executes one): load orders, delete
    cheap finished orders, return survivors — oracle = the inverted
    predicate."""
    orders = load_table(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="delete_where_")
    shutil.rmtree(loc)
    t = VersionedTable.create(spark, loc, schema=ORDERS_DDL)
    try:
        t.append(orders)
        t.delete((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 100000.0))
        # pin to executor storage before the backing files are removed
        return detach(t.read())
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@register(
    "update_set_where",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderstatus = 'P' THEN 'F' ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 50.0 ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
    """,
    category="versioned",
)
def update_set_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE SET ... WHERE through the real engine (reference G3
    declares update mode but never executes one): finalize pending
    orders with a late fee."""
    orders = load_table(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="update_where_")
    shutil.rmtree(loc)
    t = VersionedTable.create(spark, loc, schema=ORDERS_DDL)
    try:
        t.append(orders)
        t.update(
            F.col("o_orderstatus") == "P",
            {
                "o_orderstatus": F.lit("F"),
                "o_totalprice": F.col("o_totalprice") + 50.0,
            },
        )
        # pin to executor storage before the backing files are removed
        return detach(t.read())
    finally:
        shutil.rmtree(loc, ignore_errors=True)
