"""iceberg_by_example_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference repo
``skhatri/iceberg-by-example`` (a Spark 3.5 + Iceberg 1.5 worked example:
versioned/partitioned tables, MERGE upserts, branches, time travel,
write-audit-publish, maintenance) as an idiomatic PySpark engine, and
extends the query surface with the relational operator family plus
LLM-training-data operators (dedup, similarity search, text analysis,
multimodal column plumbing).

Layout
------
- ``session``    — tuned SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
- ``sources``    — TPC-H-ish parquet corpus loaders + activity CSV source
- ``tables``     — Spark-native versioned table layer (snapshots, branches,
                   MERGE, WAP, time travel, maintenance) over Parquet
- ``operators``  — relational + LLM-data operators (joins, aggs, windows,
                   dedup, similarity, text analysis, multimodal)
- ``plans``      — headline analytical queries over the driver corpus
- ``functions``  — scalar/array/map/json function showcase, shared helpers
- ``streaming``  — Structured Streaming slice over the events table
"""

__version__ = "0.1.0"
