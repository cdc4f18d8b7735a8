"""Small-files accretion under continuous ingest, and compact()'s
bound on it (r19).

Per-trigger continuous ingest (`streaming/store_ingest.py`) appends
one small file per index relation per commit — the classic
streaming-lakehouse failure mode: at a 5-minute trigger cadence the
head accumulates ~288 files/day/relation, and at 100 TB the scan's
task count follows the file count, not the data size. `compact()`
(r19 form) rewrites the append-only postings/key indexes too —
identity rows, history relabeled under the compaction's day label,
coalesced to size-bounded splits — so the HEAD returns to
O(index bytes / target) files while every pinned per-trigger read
stays intact (pytest pins bit-equality; this probe records the
numbers).

The probe runs N real micro-batch triggers through
`make_store_committer(gates=True)` (the exact curation shape) at the
given sf, recording per-index head file counts and bytes after each
trigger, after `compact()`, and after `maintain()` GC; a pinned
mid-run trigger's `read_state(as_of=)` fp count is asserted equal
across all three phases.

Usage: python tools/stream_compaction_probe.py [sf_dir] [n_triggers]
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

INDEXES = ("shingle_index", "winnow_index", "fp_index")


def _dir_bytes(root: str) -> int:
    total = 0
    for r, _d, names in os.walk(root):
        for n in names:
            total += os.path.getsize(os.path.join(r, n))
    return total


def main() -> None:
    import shutil
    import tempfile

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_triggers = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from iceberg_by_example_spark.operators.pipeline import (
        ensure_curate_state,
    )
    from iceberg_by_example_spark.session import get_spark
    from iceberg_by_example_spark.sources.tpch import load_table
    from iceberg_by_example_spark.streaming.store_ingest import (
        make_store_committer,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    spark = get_spark("stream_compaction_probe")
    state, t0 = ensure_curate_state(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    inc_ids = sorted(
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") >= t0)
        .select("doc_id")
        .collect()
    )
    cuts = [
        inc_ids[(len(inc_ids) * k) // n_triggers]
        for k in range(1, n_triggers)
    ] + [inc_ids[-1] + 1]

    root = os.path.join(
        tempfile.mkdtemp(prefix="stream_compaction_probe_"), "store"
    )
    store = CurateStateStore(spark, root)
    rows = []

    def snap_counts(phase: str, sec: float) -> dict:
        counts = {}
        for name in INDEXES:
            tbl = store._table(name)
            files = tbl._current().files
            counts[name] = {
                "files": len(files),
                "mb": round(
                    sum(
                        os.path.getsize(os.path.join(tbl.location, f))
                        for f in files
                        if os.path.exists(
                            os.path.join(tbl.location, f)
                        )
                    )
                    / 1e6,
                    2,
                ),
            }
        row = {
            "phase": phase,
            "sec": round(sec, 2),
            "store_mb": round(_dir_bytes(root) / 1e6, 2),
            **{
                f"{n}_files": counts[n]["files"] for n in INDEXES
            },
            **{f"{n}_mb": counts[n]["mb"] for n in INDEXES},
        }
        rows.append(row)
        return row

    try:
        t = time.perf_counter()
        store.commit_backfill(state, day="day0")
        snap_counts("backfill", time.perf_counter() - t)

        commit = make_store_committer(store, "probe", gates=True)
        lo = t0
        for k, hi in enumerate(cuts):
            batch = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            lo = hi
            t = time.perf_counter()
            commit(batch, k)
            snap_counts(f"trigger{k}", time.perf_counter() - t)

        pin_day = "probe-b%06d" % (n_triggers // 2)
        pinned_fp = store.read_state(as_of=pin_day)[0].fp_index.count()

        t = time.perf_counter()
        rep = store.compact()
        snap_counts("compact", time.perf_counter() - t)
        assert (
            store.read_state(as_of=pin_day)[0].fp_index.count()
            == pinned_fp
        ), "pinned trigger read changed across compact()"

        t = time.perf_counter()
        store.maintain()
        snap_counts("maintain_gc", time.perf_counter() - t)
        assert (
            store.read_state(as_of=pin_day)[0].fp_index.count()
            == pinned_fp
        ), "pinned trigger read changed across maintain()"

        cols = (
            ["phase", "sec", "store_mb"]
            + [f"{n}_files" for n in INDEXES]
            + [f"{n}_mb" for n in INDEXES]
        )
        print("| " + " | ".join(cols) + " |")
        print("|" + "---|" * len(cols))
        for r in rows:
            print(
                "| " + " | ".join(str(r[c]) for c in cols) + " |"
            )
        print(
            json.dumps(
                {
                    "probe": "stream_compaction",
                    "sf_dir": sf_dir,
                    "n_triggers": n_triggers,
                    "compacted": rep["compacted"],
                    "pinned_day": pin_day,
                    "pinned_fp_rows": pinned_fp,
                    "rows": rows,
                },
                separators=(",", ":"),
            )
        )
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
