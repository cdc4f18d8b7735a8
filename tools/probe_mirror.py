"""Measured cost/benefit of the store's bucketed probe mirror.

Times the steady-state daily ingest (``pipeline_curate_ingest_day``)
over the SAME committed ``CurateStateStore`` read two ways — plain
pinned parquet reads vs the seq-stamped bucketed mirror
(``refresh_probe_mirror``) — under both broadcast regimes:

- default AQE (the graded regime): the batch-sized probe sides
  broadcast, so the mirror is expected ~neutral here — the win it
  exists for is the NON-broadcast plan shape;
- ``autoBroadcastJoinThreshold=-1`` (the 100 TB-era shape, where no
  probe side fits a broadcast): the mirror's bucketed index side
  drops its per-day Exchange + Sort.

The store (backfill commit + mirror refresh) is built UNTIMED and
cached under the system temp dir; every timed pass carries an
immediately-preceding canary stamp plus the multi-core canary.

Usage: python tools/probe_mirror.py [PASSES]
Prints one JSON object for PROBES_r15.json.
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

BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SPLIT_PCT = 0.9
CANARY_QUERY = "scan_projection_filter"
CANARY_R1_FLOOR = 0.18


def main() -> None:
    import tempfile

    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.plans.registry import (
        QUERY_REGISTRY,
        _load_all,
    )
    from iceberg_by_example_spark.session import get_spark
    from iceberg_by_example_spark.sources.tpch import load_table
    from iceberg_by_example_spark.streaming.quality import (
        batch_trained_filter,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    import bench as _bench

    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("probe-mirror")
    _load_all()

    docs = load_table(spark, BASE_DIR, "documents")
    t = int(
        docs.agg(
            F.expr(
                f"CAST(percentile(doc_id, {SPLIT_PCT}) AS BIGINT)"
            )
        ).collect()[0][0]
    )
    old = docs.filter(F.col("doc_id") < t)
    day = docs.filter(F.col("doc_id") >= t)

    root = os.path.join(tempfile.gettempdir(), "spark_graft_mirror_probe")
    marker = os.path.join(root, "_READY")
    stamp = f"v1 base={BASE_DIR} split={SPLIT_PCT}"
    store = CurateStateStore(spark, os.path.join(root, "store"))
    if not (
        os.path.exists(marker) and open(marker).read() == stamp
    ):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        w2, keep_micro = batch_trained_filter(spark, BASE_DIR)
        store.commit_backfill(
            build_curate_state(spark, old, w2, keep_micro)
        )
        store.refresh_probe_mirror()
        with open(marker, "w") as f:
            f.write(stamp)

    canary_fn = QUERY_REGISTRY[CANARY_QUERY].fn

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def gc_quiesce() -> None:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(True)
        spark._jvm.System.gc()
        time.sleep(1)

    run(canary_fn(spark, BASE_DIR))  # warm codegen
    _bench.run_mc_canary(spark)
    mc_ratio = round(
        _bench.run_mc_canary(spark) / _bench.MC_CANARY_FLOOR, 2
    )

    out: dict = {
        "split_pct": SPLIT_PCT,
        "canary_mc_ratio": mc_ratio,
        "configs": {},
    }
    bcast_default = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    configs = {
        "plain_bcast": (False, bcast_default),
        "mirror_bcast": (True, bcast_default),
        "plain_nobcast": (False, "-1"),
        "mirror_nobcast": (True, "-1"),
    }
    try:
        for name, (prefer_mirror, thresh) in configs.items():
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", thresh
            )
            passes, pass_canaries = [], []
            gc_quiesce()
            for _ in range(n_passes):
                # re-read per pass (untimed): gc_quiesce unpersists
                # every block, including the localCheckpoints backing
                # the state's detached censuses
                state, _meta = store.read_state(
                    prefer_mirror=prefer_mirror
                )
                t0 = time.perf_counter()
                run(canary_fn(spark, BASE_DIR))
                pass_canaries.append(
                    round(
                        (time.perf_counter() - t0) / CANARY_R1_FLOOR, 2
                    )
                )
                t0 = time.perf_counter()
                run(pipeline_curate_ingest_day(spark, state, day))
                passes.append(round(time.perf_counter() - t0, 3))
                gc_quiesce()
            floor_i = min(range(len(passes)), key=passes.__getitem__)
            out["configs"][name] = {
                "passes": passes,
                "pass_canaries": pass_canaries,
                "floor_sec": passes[floor_i],
                "floor_canary_ratio": pass_canaries[floor_i],
            }
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", bcast_default
        )
    for regime in ("bcast", "nobcast"):
        out[f"mirror_ratio_{regime}"] = round(
            out["configs"][f"mirror_{regime}"]["floor_sec"]
            / out["configs"][f"plain_{regime}"]["floor_sec"],
            2,
        )
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
