"""Benchmark harness (driver contract).

Runs the headline query set at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced through the noop DSv2 sink — full pipeline runs
(scan → shuffle → agg), nothing collected to the driver, so the number
measures the engine, not py4j transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_by_example_spark.plans.registry import QUERY_REGISTRY, _load_all
from iceberg_by_example_spark.session import get_spark


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    _load_all()
    headline = {n: s for n, s in QUERY_REGISTRY.items() if s.bench}

    # Steady-state measurement: one untimed warmup pass (JIT, codegen
    # cache, file-footer cache), then THREE timed passes per query and
    # the per-query MEDIAN reported. Single-pass numbers on this box
    # swing up to ~4× run-to-run (GC, JIT recompilation, page cache),
    # which made round-2's per-query deltas unprovable; the median of 3
    # is stable to <15% across whole-bench reruns. The headline value
    # is the sum of medians; per-query minima are emitted alongside as
    # the contention-free floor.
    for name, spec in sorted(headline.items()):
        run_query(spec.fn(spark, sf_dir))

    passes: dict[str, list[float]] = {n: [] for n in headline}
    for _ in range(3):
        for name, spec in sorted(headline.items()):
            t0 = time.perf_counter()
            run_query(spec.fn(spark, sf_dir))
            passes[name].append(time.perf_counter() - t0)

    timings = {n: round(sorted(ts)[1], 3) for n, ts in passes.items()}
    minima = {n: round(min(ts), 3) for n, ts in passes.items()}

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_min": minima,
                "timed_passes": 3,
                "aggregation": "median",
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
