"""Dump `.explain("formatted")` for every bench query to plans/r{N}/.

Usage: python tools/explain_bench.py [round] [query ...]

Writes plans/r{round}/<query>_{suffix}.txt (suffix defaults to "before";
set EXPLAIN_SUFFIX=after for the post-optimization capture). Queries
that end in an eager detach (localCheckpoint) show the checkpoint scan
as their root — for those the file still records the full pre-detach
composition when the query exposes it, and the eager stages themselves
are what the bench times; the header of each file says which case it
is. Runs at sf0.01 so eager pins stay cheap: plan SHAPE (exchanges,
join strategies, pushed filters) is sf-independent for these queries.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_by_example_spark.plans.registry import QUERY_REGISTRY, _load_all
from iceberg_by_example_spark.session import get_spark

SF = os.environ.get("EXPLAIN_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "19"
    only = set(sys.argv[2:])
    suffix = os.environ.get("EXPLAIN_SUFFIX", "before")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", f"r{rnd}")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("explain-bench")
    _load_all()
    sys.path.insert(0, here)
    import bench

    bench._load_extra_bench()
    fns = {n: s.fn for n, s in QUERY_REGISTRY.items() if s.bench}
    fns.update(bench.EXTRA_BENCH_FNS)
    for name in sorted(fns):
        if only and name not in only:
            continue
        try:
            df = fns[name](spark, SF)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            p = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - record, keep going
            p = f"ERROR: {type(exc).__name__}: {exc}\n"
        detached = "ExistingRDD" in p or "LocalTableScan" in p
        head = (
            f"# query: {name}  (sf_dir={SF})\n"
            f"# note: root is a localCheckpoint/ExistingRDD scan — the\n"
            f"# query materializes eagerly inside the call (detach); the\n"
            f"# timed work is the eager stages, not this root plan.\n"
            if detached
            else f"# query: {name}  (sf_dir={SF})\n"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(head + p)
        bench.drop_pinned_blocks(spark)
        print(name, "->", path)
    spark.stop()


if __name__ == "__main__":
    main()
