"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the package registry
(``iceberg_by_example_spark.plans.registry``); this module is a thin
adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Star-schema revenue rollup: orders x broadcast(customer, nation,
    region) → revenue by region (exact-decimal sums).
    """
    from iceberg_by_example_spark.plans.relational import join_broadcast_dims

    return join_broadcast_dims(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ gap list)."""
    from iceberg_by_example_spark.plans.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys get rows-only checks."""
    from iceberg_by_example_spark.plans.registry import all_oracles

    return all_oracles()
