"""Streaming vs daily atomic-cycle cost probe (r18).

`streaming/store_ingest.py` claims the continuous atomic cycle is the
daily `curate_cycle_day(atomic=True)` at micro-batch grain: the SAME
gates, the SAME deltas, the SAME attached manifest publish, with the
streaming engine contributing bookkeeping only (file-source offsets +
checkpoint), never data movement. This probe turns that into numbers:
three consecutive ingest slices at sf0.1 run through BOTH forms
against twin stores/pack tables — the daily atomic cycle called per
day, and a REAL Structured Streaming query (file source,
maxFilesPerTrigger=1, files landed one at a time so per-trigger
shuffle deltas are observable from the driver) committing through
`make_store_committer(manifest_location=)`. Per day: wall seconds,
executor-cumulative shuffle-write delta, bytes written under the
store+packs roots.

Expected reading: shuffle MB bit-identical per day across forms (and
to the r17 atomic table: 4.83/5.57/6.27 at sf0.1); written KB within
the checkpoint directory's bookkeeping of each other.

Usage: python tools/streaming_cycle_probe.py [sf_dir]
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
    )
    from iceberg_by_example_spark.session import get_spark
    from iceberg_by_example_spark.sources.tpch import load_table
    from iceberg_by_example_spark.streaming.quality import (
        batch_trained_filter,
    )
    from iceberg_by_example_spark.streaming.store_ingest import (
        stream_curate_ingest,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.workflows import (
        curate_cycle_day,
    )
    from tools.shuffle_report import run_shuffle_bytes

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("streaming-cycle-probe")

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
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in zip(cuts, cuts[1:] + [1 << 62])
    ]
    w2, keep_micro = batch_trained_filter(spark, sf_dir)

    base = os.path.join(
        tempfile.gettempdir(), "spark_graft_streaming_probe"
    )
    shutil.rmtree(base, ignore_errors=True)
    out: dict[str, list] = {}

    # -- daily atomic cycle, one call per day ------------------------------
    root = os.path.join(base, "daily", "store")
    packs = os.path.join(base, "daily", "packs")
    store = CurateStateStore(spark, root)
    store.commit_backfill(
        build_curate_state(spark, old, w2, keep_micro), day="day0"
    )
    prev = _dir_bytes(os.path.join(base, "daily"))
    rows = []
    for i, day in enumerate(days, start=1):
        sh0 = run_shuffle_bytes(spark)
        t0 = time.perf_counter()
        curate_cycle_day(
            spark, store, day, packs, day=f"day{i}", atomic=True
        )
        wall = time.perf_counter() - t0
        sh_mb = (run_shuffle_bytes(spark) - sh0) / 1_048_576
        b = _dir_bytes(os.path.join(base, "daily"))
        rows.append(
            {
                "day": f"day{i}",
                "sec": round(wall, 2),
                "shuffle_mb": round(sh_mb, 2),
                "written_kb": round((b - prev) / 1024, 1),
            }
        )
        prev = b
    out["daily_atomic"] = rows

    # -- the REAL stream: land one file per day, drain the trigger ---------
    sroot = os.path.join(base, "stream")
    store2 = CurateStateStore(spark, os.path.join(sroot, "store"))
    store2.commit_backfill(
        build_curate_state(spark, old, w2, keep_micro), day="day0"
    )
    # inputs staged OUTSIDE sroot: written_kb must count only what the
    # cycle itself writes (store + packs + checkpoint), not the input
    # batch bytes the daily form reads straight from testdata
    flat = os.path.join(base, "stream_in")
    os.makedirs(flat)
    stream_df = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    prev = _dir_bytes(sroot)
    rows = []
    for i, day in enumerate(days, start=1):
        staged = os.path.join(base, f"stage{i}")
        day.coalesce(1).write.parquet(staged)
        (part,) = [
            f for f in os.listdir(staged) if f.endswith(".parquet")
        ]
        os.link(
            os.path.join(staged, part),
            os.path.join(flat, f"b{i:03d}.parquet"),
        )
        os.utime(
            os.path.join(flat, f"b{i:03d}.parquet"),
            times=(1_700_000_000 + i * 10,) * 2,
        )
        sh0 = run_shuffle_bytes(spark)
        t0 = time.perf_counter()
        q = stream_curate_ingest(
            stream_df,
            store2,
            checkpoint_dir=os.path.join(sroot, "ckpt"),
            stream_id="probe",
            manifest_location=os.path.join(sroot, "packs"),
        )
        q.processAllAvailable()
        q.stop()
        wall = time.perf_counter() - t0
        sh_mb = (run_shuffle_bytes(spark) - sh0) / 1_048_576
        b = _dir_bytes(sroot)
        rows.append(
            {
                "day": f"day{i}",
                "sec": round(wall, 2),
                "shuffle_mb": round(sh_mb, 2),
                "written_kb": round((b - prev) / 1024, 1),
            }
        )
        prev = b
    out["streaming_atomic"] = rows

    print()
    print("| day | form | sec | run shuffle MB | written KB |")
    print("|---|---|---|---|---|")
    for mode, rows in out.items():
        for r in rows:
            print(
                f"| {r['day']} | {mode} | {r['sec']} | "
                f"{r['shuffle_mb']} | {r['written_kb']} |"
            )
    print()
    print(json.dumps(out, separators=(",", ":")))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
