"""Runnable end-to-end demo: the reference's two programs, Spark-native.

    python -m iceberg_by_example_spark.demo [warehouse_dir]

Replays `IcebergLoadActivityTask` (5 daily ingests with MERGE + branch
per day, versioned reads, metadata print, maintenance) followed by
`WapIceberg` (write-audit-publish: one clean batch published, one
null-bearing batch rejected) against a local warehouse, printing the
same observable results the reference's README documents.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

from iceberg_by_example_spark.session import get_spark
from iceberg_by_example_spark.sources.activity import REFERENCE_INPUT_DIR
from iceberg_by_example_spark.tables.workflows import (
    count_at,
    create_activity_table,
    ingest_day,
    maintain,
    metadata_counts,
    wap_load,
)

DAYS = [
    ("2024-03-02", "day1"),
    ("2024-03-03", "day2"),
    ("2024-03-05", "day3"),
    ("2024-03-08", "day4"),
    ("2024-03-09", "day5"),
]


def main() -> None:
    warehouse = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="activity_demo_"
    )
    spark = get_spark("activity-demo", master="local[8]", shuffle_partitions=8)

    print(f"== warehouse: {warehouse}")
    table = create_activity_table(spark, f"{warehouse}/activity")

    for day, branch in DAYS:
        ingest_day(table, f"{REFERENCE_INPUT_DIR}/{day}", branch)
        print(f"loaded {day} -> branch {branch}, count={count_at(table)}")

    print("\n== flagship aggregate (group by account)")
    table.read().groupBy("account").agg(
        F.count("*").alias("activity_count")
    ).orderBy("account").show()

    print("== time travel: txn10 across versions")
    for branch in ("day1", "day5", None):
        table.read(branch=branch).filter(F.col("txn_id") == "txn10").select(
            "txn_id", "category", "last_updated"
        ).show(2, truncate=False)

    print("== metadata tables:", metadata_counts(table))

    print("\n== maintenance (compaction, expiry, orphan GC)")
    report = maintain(table)
    print(
        f"expired={len(report['expired'])} "
        f"orphans_removed={len(report['orphans_removed'])}, "
        f"count={count_at(table)}"
    )

    print("\n== write-audit-publish")
    t2 = create_activity_table(spark, f"{warehouse}/activity2")
    ok = wap_load(t2, f"{REFERENCE_INPUT_DIR}/2024-03-02")
    print(f"2024-03-02 published={ok}, count={count_at(t2)}")
    ok = wap_load(t2, f"{REFERENCE_INPUT_DIR}/2024-03-10")
    print(f"2024-03-10 published={ok} (null audit), count={count_at(t2)}")

    spark.stop()


if __name__ == "__main__":
    main()
