"""Atomic vs two-commit daily-cycle cost probe (r17 VERDICT #5's
measurement half): chain three consecutive ingest days at sf0.1
through BOTH forms of ``curate_cycle_day`` — the default two-commit
(manifest WAP publish, then state pointer commit) and the
single-commit ``atomic=True`` (manifest rides the pointer append as
an attached relation) — against twin stores and twin pack tables, and
record PER DAY the wall time, the executor-cumulative shuffle-write
delta, and the bytes written under store root + pack location.

The claim under test: atomic mode changes WHERE the manifest append
commits (the store's nonce'd branch + the shared pointer row) but not
WHAT moves — same gates, same deltas, same manifest rows, so shuffle
and written bytes match the two-commit form day for day, and the
structural win (no crash window) is free.

Usage: python tools/atomic_cycle_probe.py [sf_dir]
Prints a markdown section for PROBES/SHUFFLE_BYTES plus one JSON line.
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
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.workflows import (
        curate_cycle_day,
    )
    from tools.shuffle_report import run_shuffle_bytes

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("atomic-cycle-probe")

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
        tempfile.gettempdir(), "spark_graft_atomic_probe"
    )
    shutil.rmtree(base, ignore_errors=True)
    out: dict[str, list] = {}
    for mode in ("two_commit", "atomic"):
        root = os.path.join(base, mode, "store")
        packs = os.path.join(base, mode, "packs")
        store = CurateStateStore(spark, root)
        st0 = build_curate_state(spark, old, w2, keep_micro)
        store.commit_backfill(st0, day="day0")
        prev = _dir_bytes(os.path.join(base, mode))
        rows = []
        for i, day in enumerate(days, start=1):
            sh0 = run_shuffle_bytes(spark)
            t0 = time.perf_counter()
            curate_cycle_day(
                spark,
                store,
                day,
                packs,
                day=f"day{i}",
                atomic=(mode == "atomic"),
            )
            wall = time.perf_counter() - t0
            sh_mb = (run_shuffle_bytes(spark) - sh0) / 1_048_576
            b = _dir_bytes(os.path.join(base, mode))
            rows.append(
                {
                    "day": f"day{i}",
                    "sec": round(wall, 2),
                    "shuffle_mb": round(sh_mb, 2),
                    "written_kb": round((b - prev) / 1024, 1),
                }
            )
            prev = b
        out[mode] = rows

    print()
    print("| day | mode | sec | run shuffle MB | written KB |")
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
