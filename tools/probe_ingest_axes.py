"""Two-axis scale probe for pipeline_curate_ingest_day (r14 VERDICT #4).

The r14 10x probe scaled batch AND index together, so its single
ratio could not say which term of the O(batch + index) claim carried
the time. This probe separates the axes:

- ``base``      — standing state over the sf0.1 OLD slice (doc_id
                  below the 0.9 split), batch = the day slice.
- ``batch10x``  — SAME standing state, batch replicated 10x (each
                  replica token-tagged, bench.py's independence trick,
                  ids offset far above the watermark).
- ``index10x``  — standing state over the OLD slice replicated 10x
                  (same tagging), batch = the day slice re-id'd above
                  every replica id.

All three states are built UNTIMED with the SAME stored model
constants (trained once on the base corpus) and cached as on-disk
parquet (write_curate_state) under the system temp dir, so the timed
passes pay exactly the steady-state daily job. Every pass carries an
immediately-preceding canary stamp plus the multi-core canary
(bench-host-noise discipline); floors are reported with the stamp of
the pass that set them.

Usage: python tools/probe_ingest_axes.py [PASSES]
Prints one JSON object for PROBES_r15.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import DataFrame, functions as F

REPLICAS = 10
BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SPLIT_PCT = 0.9
ID_OFFSET = 10_000_000
BATCH_SHIFT = 100_000_000  # index10x batch ids, above every replica
CANARY_QUERY = "scan_projection_filter"
CANARY_R1_FLOOR = 0.18


def _union_all(parts):
    return functools.reduce(DataFrame.unionByName, parts)


def tagged_replicas(docs: DataFrame, replicas: int) -> DataFrame:
    """bench.py's replica independence trick: replica 0 verbatim,
    each other replica token-tagged so replicas share no shingles."""
    reps = []
    for r in range(replicas):
        txt = (
            F.col("text")
            if r == 0
            else F.concat(
                F.lit(f"r{r}_"), F.regexp_replace("text", " ", f" r{r}_")
            )
        )
        reps.append(
            docs.select(
                (F.col("doc_id") + r * ID_OFFSET).alias("doc_id"),
                txt.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    return _union_all(reps)


def main() -> None:
    import tempfile

    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
        read_curate_state,
        write_curate_state,
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
    import bench as _bench

    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("probe-ingest-axes")
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

    root = os.path.join(tempfile.gettempdir(), "spark_graft_ingest_axes")
    marker = os.path.join(root, "_READY")
    stamp = f"v1 base={BASE_DIR} split={SPLIT_PCT} reps={REPLICAS}"
    if not (
        os.path.exists(marker) and open(marker).read() == stamp
    ):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        w2, keep_micro = batch_trained_filter(spark, BASE_DIR)
        st_base = build_curate_state(spark, old, w2, keep_micro)
        write_curate_state(st_base, os.path.join(root, "base"))
        st_idx = build_curate_state(
            spark, tagged_replicas(old, REPLICAS), w2, keep_micro
        )
        write_curate_state(st_idx, os.path.join(root, "idx10"))
        with open(marker, "w") as f:
            f.write(stamp)

    def batch_base():
        return day

    def batch_10x():
        return tagged_replicas(day, REPLICAS)

    def batch_shifted():
        return day.withColumn(
            "doc_id", F.col("doc_id") + F.lit(BATCH_SHIFT)
        )

    configs = {
        "base": ("base", batch_base),
        "batch10x": ("base", batch_10x),
        "index10x": ("idx10", batch_shifted),
    }

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
        "replicas": REPLICAS,
        "split_pct": SPLIT_PCT,
        "canary_mc_ratio": mc_ratio,
        "configs": {},
    }
    for name, (state_key, batch_fn) in configs.items():
        state, _meta = read_curate_state(
            spark, os.path.join(root, state_key)
        )
        passes, pass_canaries = [], []
        gc_quiesce()
        for _ in range(n_passes):
            t0 = time.perf_counter()
            run(canary_fn(spark, BASE_DIR))
            pass_canaries.append(
                round((time.perf_counter() - t0) / CANARY_R1_FLOOR, 2)
            )
            t0 = time.perf_counter()
            run(pipeline_curate_ingest_day(spark, state, batch_fn()))
            passes.append(round(time.perf_counter() - t0, 3))
            gc_quiesce()
        floor_i = min(range(len(passes)), key=passes.__getitem__)
        out["configs"][name] = {
            "passes": passes,
            "pass_canaries": pass_canaries,
            "floor_sec": passes[floor_i],
            "floor_canary_ratio": pass_canaries[floor_i],
        }

    base_floor = out["configs"]["base"]["floor_sec"]
    out["batch10x_ratio"] = round(
        out["configs"]["batch10x"]["floor_sec"] / base_floor, 2
    )
    out["index10x_ratio"] = round(
        out["configs"]["index10x"]["floor_sec"] / base_floor, 2
    )
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
