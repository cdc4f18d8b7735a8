"""Run ONE registry query in a fresh process and print a JSON line.

The r9 scaling probes blew up ~7x on unchanged code; the leading
suspect was session accumulation (the 30x probes run LAST in a session
that has already executed 37 bench queries x 4 passes) and host
contention sampled only at run start. This runner removes both
variables: a brand-new JVM per probe, and the contention canary timed
IMMEDIATELY before the probe so the stamp describes the same host
window the probe ran in.

Usage: python tools/probe_one.py QUERY_NAME DATA_DIR [PASSES]

Prints: {"query":..., "canary_sec":..., "canary_ratio":...,
         "passes":[...], "floor_sec":...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_by_example_spark.plans.registry import QUERY_REGISTRY, _load_all
from iceberg_by_example_spark.session import get_spark

CANARY_QUERY = "scan_projection_filter"
CANARY_R1_FLOOR = 0.18  # keep in sync with bench.py


def main() -> None:
    name = sys.argv[1]
    data_dir = sys.argv[2]
    n_passes = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    canary_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark(f"probe-{name}")
    _load_all()
    if name in QUERY_REGISTRY:
        fn = QUERY_REGISTRY[name].fn
    else:
        # bench-only operators (the registration queue) live in
        # bench.EXTRA_BENCH_FNS — probe them the same way
        import bench

        bench._load_extra_bench()
        fn = bench.EXTRA_BENCH_FNS[name]

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Warm the session on the canary (JIT/codegen the scan path), then
    # time it: the timed canary is the contention stamp for THIS window.
    canary_spec = QUERY_REGISTRY[CANARY_QUERY]
    run(canary_spec.fn(spark, canary_dir))
    t0 = time.perf_counter()
    run(canary_spec.fn(spark, canary_dir))
    canary_sec = time.perf_counter() - t0
    # multi-core stamp (r14): the scan canary is single-task, so a
    # neighbor stealing ONE vCPU reads hot even when the 32-task
    # stages run at full speed — record both so a probe window can be
    # diagnosed (bench.py's r11 lesson applied to the probe runner)
    import bench as _bench

    _bench.run_mc_canary(spark)  # warm its codegen
    mc_sec = _bench.run_mc_canary(spark)
    mc_ratio = round(mc_sec / _bench.MC_CANARY_FLOOR, 2)

    def gc_quiesce() -> None:
        """Unpersist pinned blocks AND force a JVM GC (outside any
        timed section). Without the GC, repeat heavy queries in one
        session degrade ~6x: the 32g driver heap GCs so rarely that
        ContextCleaner work (shuffle/broadcast cleanup is weak-ref
        driven) piles up and lands inside a later query's timed
        window — measured 10.7s -> 59.3s on back-to-back identical
        runs, restored to 11.1s stable with a forced GC between."""
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(True)
        spark._jvm.System.gc()
        time.sleep(1)

    gc_quiesce()
    passes = []
    pass_canaries = []
    for _ in range(n_passes):
        # Per-PASS canary (r11): on a shared microVM the host window
        # can change mid-run — the r10 cluster probe showed a 27.3s /
        # 13.6s spread inside ONE invocation, so a single run-start
        # stamp can't say which pass was the quiet one. Each pass now
        # carries its own immediately-preceding canary, and the floor
        # is reported with the stamp of the pass that SET it.
        t0 = time.perf_counter()
        run(canary_spec.fn(spark, canary_dir))
        pass_canaries.append(
            round((time.perf_counter() - t0) / CANARY_R1_FLOOR, 2)
        )
        t0 = time.perf_counter()
        run(fn(spark, data_dir))
        passes.append(round(time.perf_counter() - t0, 3))
        gc_quiesce()

    floor_i = min(range(len(passes)), key=passes.__getitem__)
    print(
        json.dumps(
            {
                "query": name,
                "data_dir": data_dir,
                "canary_sec": round(canary_sec, 3),
                "canary_ratio": round(canary_sec / CANARY_R1_FLOOR, 2),
                "canary_mc_ratio": mc_ratio,
                "passes": passes,
                "pass_canaries": pass_canaries,
                "floor_sec": passes[floor_i],
                "floor_canary_ratio": pass_canaries[floor_i],
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
