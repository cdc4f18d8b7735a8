"""Central query registry.

Every operator this engine implements registers here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) a DuckDB oracle SQL string computing
the same result over the same parquet tables. The driver contract
(``__spark_entry__.py``) and ``bench.py`` both read this registry.

Determinism rules for oracle-checked queries
--------------------------------------------
1. Alias every computed column identically in Spark and SQL.
2. Never expose a raw double aggregate: sum/avg of doubles is
   order-dependent, and Spark and DuckDB reduce in different orders.
   Aggregate via exact decimal then cast back (see functions.exact).
3. Pin the session timezone to UTC (session.py) — parquet timestamps
   then render identically in both engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL op)
    category: str
    bench: bool = False  # include in bench.py headline set


QUERY_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    category: str,
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in QUERY_REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        QUERY_REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, category=category, bench=bench
        )
        return fn

    return wrap


# Modules that register queries on import. Extend as operators land.
_QUERY_MODULES = [
    "iceberg_by_example_spark.plans.relational",
    "iceberg_by_example_spark.plans.windows",
    "iceberg_by_example_spark.plans.setops",
    "iceberg_by_example_spark.plans.scalar",
    "iceberg_by_example_spark.tables.demo",
    "iceberg_by_example_spark.operators.text",
    "iceberg_by_example_spark.operators.dedup",
    "iceberg_by_example_spark.operators.similarity",
    "iceberg_by_example_spark.operators.multimodal",
    "iceberg_by_example_spark.streaming.events",
    "iceberg_by_example_spark.operators.joins",
    "iceberg_by_example_spark.plans.reshape",
    "iceberg_by_example_spark.plans.udfs",
    "iceberg_by_example_spark.sources.csv_query",
    "iceberg_by_example_spark.operators.skew",
    "iceberg_by_example_spark.plans.analytics",
]


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import importlib

    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in QUERY_REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle
        for name, spec in QUERY_REGISTRY.items()
        if spec.oracle is not None
    }


def bench_queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: s.fn for n, s in QUERY_REGISTRY.items() if s.bench}
