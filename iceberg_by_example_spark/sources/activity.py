"""CSV source for the reference's ``activity`` fixture.

Mirrors the reference's explicit-schema CSV read
(``IcebergLoadActivityTask.scala:51-63``): header on, schema declared
(never inferred — the reference sets ``inferSchema`` then overrides it
with an explicit StructType, so inference is dead config we drop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Schema per IcebergLoadActivityTask.scala:54-62 / DDL at :18-26.
ACTIVITY_SCHEMA = StructType(
    [
        StructField("account", StringType(), False),
        StructField("txn_date", DateType(), False),
        StructField("txn_id", StringType(), False),
        StructField("merchant", StringType(), True),
        StructField("amount", DoubleType(), True),
        StructField("category", StringType(), True),
        StructField("last_updated", TimestampType(), True),
    ]
)

# Where the reference keeps its daily CSV folders (data fixture, read-only).
REFERENCE_INPUT_DIR = "/root/reference/src/main/resources/input"


def read_activity_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read one day-folder (or file) of activity CSV with the fixed schema."""
    return (
        spark.read.format("csv")
        .option("header", "true")
        .schema(ACTIVITY_SCHEMA)
        .load(path)
    )


def rows_with_any_null(df: DataFrame) -> DataFrame:
    """Column-native rewrite of the reference's row-level null scan.

    The reference audits with a typed Scala lambda over each Row
    (``WapIceberg.scala:70-75``). A per-row Python lambda would cross the
    Python<->JVM boundary per row; this stays inside whole-stage codegen
    and therefore vectorized at any scale.
    """
    predicate = None
    for c in df.columns:
        cond = F.col(c).isNull()
        predicate = cond if predicate is None else (predicate | cond)
    return df.filter(predicate)
