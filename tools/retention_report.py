"""Retention soak over the versioned state store (r16: the measured
half of ``maintain(retain_days=)``): chain FIVE consecutive ingest
days at sf0.1 through ``CurateStateStore`` twice — once with the
nightly maintenance window running the retention horizon
(``compact()`` + ``maintain(retain_days=2)``) and once with the same
window but unbounded history (``maintain()``) — and record the
on-disk byte series after each night.

The claim under test: store bytes decompose into a LIVE term (the
standing indexes — grows with the corpus, the data itself) plus a
HISTORY term (pre-compaction partials and superseded snapshots pinned
only by old pointer rows). Without retention the history term grows
monotonically with days elapsed; with ``retain_days=N`` it is bounded
by the N-day tail, so the with-retention series tracks the live term
and the gap between the two series widens every night.

Usage: python tools/retention_report.py [sf_dir]
Prints a markdown section for SHUFFLE_BYTES.md plus one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

N_DAYS = 5
RETAIN = 2


def _dir_bytes(root: str) -> int:
    total = 0
    for r, _d, names in os.walk(root):
        for n in names:
            total += os.path.getsize(os.path.join(r, n))
    return total


def _day_slices(spark, sf_dir: str):
    from iceberg_by_example_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents")
    pcts = [0.7 + 0.3 * i / N_DAYS for i in range(N_DAYS + 1)]
    cuts = [
        int(c)
        for c in docs.agg(
            *[
                F.expr(f"CAST(percentile(doc_id, {p}) AS BIGINT)")
                for p in pcts[:-1]
            ]
        ).collect()[0]
    ]
    old = docs.filter(F.col("doc_id") < cuts[0])
    days = [
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in zip(cuts, cuts[1:] + [1 << 62])
    ]
    return old, days


def _chain(spark, sf_dir: str, old, days, st0, retain_days):
    """One 5-day chain; returns the per-night byte series. The nightly
    window is compact() + maintain(retain_days=...) — the probe mirror
    refresh is skipped on purpose: its bytes are a separate,
    generation-bounded cache and would blur the history-term story."""
    from iceberg_by_example_spark.operators.pipeline import (
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    tag = "retain" if retain_days else "norootcap"
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_retention_{tag}"
    )
    shutil.rmtree(root, ignore_errors=True)
    store = CurateStateStore(spark, root)
    store.commit_backfill(st0, day="day0")
    rows = []
    for i, day in enumerate(days, start=1):
        t0 = time.perf_counter()
        state, _meta = store.read_state()
        surv = pipeline_curate_ingest_day(
            spark, state, day, return_survivors=True
        )
        store.commit_day(day, surv, day=f"day{i}")
        store.compact()
        report = store.maintain(retain_days=retain_days)
        wall = time.perf_counter() - t0
        rows.append(
            {
                "day": f"day{i}",
                "sec": round(wall, 2),
                "kb": round(_dir_bytes(root) / 1024, 1),
                "expired_days": (
                    report.get("retention", {}).get("expired_days", [])
                ),
            }
        )
    shutil.rmtree(root, ignore_errors=True)
    return rows


def main() -> None:
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
    )
    from iceberg_by_example_spark.session import get_spark
    from iceberg_by_example_spark.streaming.quality import (
        batch_trained_filter,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("retention-report")
    old, days = _day_slices(spark, sf_dir)
    w2, keep_micro = batch_trained_filter(spark, sf_dir)
    # one state build feeds both chains: byte series must differ only
    # by the retention policy, never by recompute noise
    st0 = build_curate_state(spark, old, w2, keep_micro)
    bounded = _chain(spark, sf_dir, old, days, st0, RETAIN)
    unbounded = _chain(spark, sf_dir, old, days, st0, None)

    print()
    print(
        f"| night | retain_days={RETAIN} KB | unbounded KB | "
        "history gap KB |"
    )
    print("|---|---|---|---|")
    for b, u in zip(bounded, unbounded):
        print(
            f"| {b['day']} | {b['kb']} | {u['kb']} | "
            f"{round(u['kb'] - b['kb'], 1)} |"
        )
    print()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "retain_days": RETAIN,
                "bounded": bounded,
                "unbounded": unbounded,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
