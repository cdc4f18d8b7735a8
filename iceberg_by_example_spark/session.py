"""SparkSession factory with scale-aware defaults.

Derived from the reference's session wiring
(``IcebergSupport.scala:16-36``): the reference builds a ``local[2]``
session with Iceberg catalog extensions. We keep the env-var-driven
construction but tune for the driver's ``local[32]`` / 128 GiB box and,
by the same knobs, for a real multi-executor cluster:

- AQE on (runtime coalescing + skew-join splitting) so shuffle
  partition counts self-correct when data is 1000x bigger.
- Arrow on, so any unavoidable pandas-UDF path is batch-vectorized.
- Session timezone pinned to UTC so results are reproducible against
  the DuckDB oracle and across clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


# Confs the engine depends on that are safe to set on a live session.
# Applied defensively by the loaders: the harness driving this engine may
# hand us a session built without them.
RUNTIME_CONFS = {
    # TIMESTAMP(NANOS) parquet (events.ts) is unreadable otherwise.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Reproducible timestamp rendering across engines/hosts.
    "spark.sql.session.timeZone": "UTC",
}


def ensure_runtime_confs(spark: SparkSession) -> None:
    for key, value in RUNTIME_CONFS.items():
        if spark.conf.get(key, None) != value:
            spark.conf.set(key, value)


def get_spark(
    app_name: str = "iceberg-by-example-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``). On a real cluster, pass ``master=None`` with
    ``spark.master`` preset in the environment and these configs still
    apply.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- shuffle & adaptive execution -------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- python <-> jvm boundary ------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- reproducibility --------------------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # TIMESTAMP(NANOS) parquet (events.ts) is unreadable by Spark's
        # vectorized reader; surface as long and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- scan sizing: 128 MiB splits, like a production lake --------
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # --- local-mode niceties (no-ops on a cluster) -------------------
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
