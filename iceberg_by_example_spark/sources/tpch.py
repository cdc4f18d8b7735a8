"""Loaders for the driver's TPC-H-ish parquet corpus.

Tables (one parquet file per table, see TESTDATA.md):
``region nation customer supplier part orders lineitem events
documents embeddings``.

Loading stays fully declarative (``spark.read.parquet``) so Catalyst
keeps predicate pushdown / column pruning / partition-split planning —
at 100 TB each .parquet becomes a directory of files and nothing here
changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table. Path layout: ``{sf_dir}/{name}.parquet``.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark reads only as
    a long (``spark.sql.legacy.parquet.nanosAsLong``, set in session.py).
    Convert to a micro-precision timestamp here — integer ``div`` so the
    truncation matches how micro-precision engines (DuckDB) read the
    same file.
    """
    from iceberg_by_example_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
