"""Multi-day ingest soak over the versioned state store (r14 VERDICT
#3's measurement half): chain three consecutive ingest days at sf0.1
through ``CurateStateStore`` — read_state → ingest → commit_day — and
record, PER DAY, the wall time, the executor-cumulative shuffle-write
delta, and the on-disk bytes the commit added. The claim under test:
per-day cost (time, shuffle, written bytes) does not grow with days
elapsed, because every day probes indexes and appends O(batch)
partitions — day 3 pays the same as day 1.

Usage: python tools/soak_report.py [sf_dir]
Prints a markdown section for SHUFFLE_BYTES.md plus one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F


def _dir_bytes(root: str) -> int:
    total = 0
    for r, _d, names in os.walk(root):
        for n in names:
            total += os.path.getsize(os.path.join(r, n))
    return total


def main() -> None:
    import shutil
    import tempfile

    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.session import get_spark
    from iceberg_by_example_spark.sources.tpch import load_table
    from iceberg_by_example_spark.streaming.quality import (
        batch_trained_filter,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from tools.shuffle_report import run_shuffle_bytes

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("soak-report")

    docs = load_table(spark, sf_dir, "documents")
    cuts = [
        int(c)
        for c in docs.agg(
            *[
                F.expr(f"CAST(percentile(doc_id, {p}) AS BIGINT)")
                for p in (0.7, 0.8, 0.9)
            ]
        ).collect()[0]
    ]
    old = docs.filter(F.col("doc_id") < cuts[0])
    days = [
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        for lo, hi in zip(cuts, cuts[1:] + [1 << 62])
    ]

    root = os.path.join(tempfile.gettempdir(), "spark_graft_soak_store")
    shutil.rmtree(root, ignore_errors=True)
    store = CurateStateStore(spark, root)

    w2, keep_micro = batch_trained_filter(spark, sf_dir)
    st0 = build_curate_state(spark, old, w2, keep_micro)
    store.commit_backfill(st0, day="day0")
    backfill_bytes = _dir_bytes(root)

    rows = []
    prev_bytes = backfill_bytes
    for i, day in enumerate(days, start=1):
        sh0 = run_shuffle_bytes(spark)
        t0 = time.perf_counter()
        state, _meta = store.read_state()
        surv = pipeline_curate_ingest_day(
            spark, state, day, return_survivors=True
        )
        store.commit_day(day, surv, day=f"day{i}")
        wall = time.perf_counter() - t0
        sh_mb = (run_shuffle_bytes(spark) - sh0) / 1_048_576
        b = _dir_bytes(root)
        rows.append(
            {
                "day": f"day{i}",
                "batch_docs": day.count(),
                "sec": round(wall, 2),
                "shuffle_mb": round(sh_mb, 2),
                "written_kb": round((b - prev_bytes) / 1024, 1),
            }
        )
        prev_bytes = b

    print()
    print(
        "| day | batch docs | sec | run shuffle MB | written KB |"
    )
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['day']} | {r['batch_docs']} | {r['sec']} | "
            f"{r['shuffle_mb']} | {r['written_kb']} |"
        )
    print()
    print(
        json.dumps(
            {
                "backfill_kb": round(backfill_bytes / 1024, 1),
                "days": rows,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
