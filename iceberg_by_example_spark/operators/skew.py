"""Skew-handling operators: salted joins and two-phase aggregation.

At 100 TB a hot key turns one shuffle partition into the job's critical
path. Two standard remedies, both expressed declaratively so the
results stay oracle-identical to their unsalted forms:

- **Salted join**: replicate the (small) dim side across SALT buckets
  and route fact rows by a deterministic salt, so a hot key's rows
  spread over SALT reducers instead of one.
- **Two-phase aggregation**: partial-aggregate on (key, salt), then
  final-aggregate on key — the hot key's partials combine in parallel.

AQE's skew-join splitting (enabled in session.py) handles much of this
automatically at runtime; explicit salting remains the tool when the
skew is in the *aggregation* key or the planner lacks statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table

SALT = 16


@register(
    "join_salted",
    oracle="""
    WITH dim AS (
      SELECT user_id, COUNT(*) AS user_events FROM events GROUP BY user_id)
    SELECT e.event_id, e.user_id, e.event_type, d.user_events
    FROM events e JOIN dim d ON e.user_id = d.user_id
    """,
    category="join",
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-dim join. The salt is ``event_id % SALT`` —
    deterministic (reruns give identical routing; no rand() in the
    plan). The dim side explodes x SALT and the join key becomes
    (user_id, salt); the result is provably identical to the plain
    join, which is exactly what the oracle checks."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.count("*").alias("user_events"))
    dim_salted = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    )
    fact_salted = ev.withColumn("salt", (F.col("event_id") % SALT).cast("int"))
    return fact_salted.join(
        dim_salted, ["user_id", "salt"]
    ).select("event_id", "user_id", "event_type", "user_events")


@register(
    "agg_two_phase_salted",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
    category="agg",
)
def agg_two_phase_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase aggregation over a low-cardinality (hence hot) key:
    phase 1 aggregates (event_type, salt) — 16-way parallel even for a
    single key; phase 2 combines the partials. Counts and quantized
    sums are associative, so the result equals the direct group-by."""
    ev = load_table(spark, sf_dir, "events")
    phase1 = (
        ev.withColumn("salt", (F.col("event_id") % SALT).cast("int"))
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.round(F.col("value") * 1_000_000, 0).cast("long")).alias(
                "pq"
            ),
        )
    )
    return phase1.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        (F.sum("pq") / F.lit(1_000_000.0)).alias("total_value"),
    )


@register(
    "diag_key_skew",
    oracle="""
    WITH per_key AS (
      SELECT l_orderkey AS key, COUNT(*) AS n
      FROM lineitem GROUP BY l_orderkey),
    tot AS (
      SELECT COUNT(*) AS n_keys,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             MAX(n) AS max_n
      FROM per_key),
    top AS (
      SELECT key, n FROM per_key
      ORDER BY n DESC, key LIMIT 5)
    SELECT t.key AS hot_key, t.n AS hot_rows,
           o.n_rows / CAST(o.n_keys AS DOUBLE) AS mean_rows_per_key,
           t.n / (o.n_rows / CAST(o.n_keys AS DOUBLE)) AS skew_factor
    FROM top t, tot o
    """,
    category="join",
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis — the measurement that decides whether
    `join_salted` / AQE skew handling is needed BEFORE a production
    join ships: the 5 heaviest keys with their row counts and skew
    factor (hot-key rows ÷ mean rows per key). A skew factor in the
    hundreds means one post-shuffle partition does hundreds of
    partitions' work.

    Scale shape: one map-side-combinable count per key, a 1-row
    global aggregate (broadcast back), and a TakeOrderedAndProject
    top-5 — the full diagnosis costs one aggregation pass, so it can
    run as a pre-flight on every scheduled join."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
    )
    top = per_key.orderBy(F.desc("n"), F.asc("key")).limit(5)
    mean = F.col("n_rows") / F.col("n_keys").cast("double")
    return top.crossJoin(F.broadcast(tot)).select(
        F.col("key").alias("hot_key"),
        F.col("n").alias("hot_rows"),
        mean.alias("mean_rows_per_key"),
        (F.col("n") / mean).alias("skew_factor"),
    )


def aqe_skew_join_demo(spark: SparkSession, n_rows: int = 400_000):
    """Planted-skew join for the AQE runtime-split demonstration —
    UNREGISTERED (the output is a 1-row aggregate whose value is
    partitioning-trivial; what matters is the PLAN, which
    tests/test_plans.py asserts): 90% of the fact rows share one join
    key, the rest spread over 96 keys, and each row carries a 96-char
    high-entropy payload so the hot partition's estimated shuffle
    size reflects real bytes (a constant payload compresses away and
    hides the skew from AQE's MapOutputStatistics — found the hard
    way).

    Three conditions the demo encodes, each a production gotcha:
    - the payload must SURVIVE column pruning into the shuffle (the
      probe aggregates min(pay)), or the skewed partition shrinks to
      its 8-byte keys;
    - the post-join aggregate must not REQUIRE the join's hash
      partitioning (a groupBy on the join key blocks the split —
      AQE refuses to break a partitioning a downstream operator
      reuses); the global agg here is partition-independent;
    - thresholds sized to the demo (skewedPartitionThresholdInBytes /
      advisoryPartitionSizeInBytes) — production defaults (256 MB)
      are the same rule at 1000× the bytes.

    This is the runtime complement to ``join_salted``: salting
    rewrites the QUERY to pre-split a known hot key; AQE splits the
    skewed partitions it MEASURES at the map-stage boundary, no query
    change at all."""
    pay = F.concat(
        F.md5(F.col("id").cast("string")),
        F.md5((F.col("id") + 1).cast("string")),
        F.md5((F.col("id") + 2).cast("string")),
    )
    fact = spark.range(n_rows).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.col("id") % 97)
        .alias("k"),
        pay.alias("pay"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.col("id")).alias("lab"),
    )
    return fact.join(dim, "k").agg(
        F.count("*").alias("n"), F.min("pay").alias("p0")
    )
