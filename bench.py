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


def drop_pinned_blocks(spark) -> None:
    """Drop pinned blocks (localCheckpoint / persist) left by the
    query that just ran. Pinned RDDs otherwise linger until JVM GC
    triggers the ContextCleaner, and 29 queries × 4 passes of
    accumulated blocks slows later queries (storage eviction + GC
    pressure) — each query should be timed against a clean executor,
    as the driver would run it. Called OUTSIDE the timed section;
    BLOCKING, so eviction never bleeds into the next query's timed
    window (non-blocking removal overlapped the next timer and showed
    up as multi-second phantom regressions after pin-heavy sf1
    probes)."""
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)


# ---------------------------------------------------------------------------
# sf1 scaling probe: run the heaviest query families ONCE at 10× the
# bench rows and report sf1/sf0.1 time ratios. A bounded design (df-
# capped candidates, banded LSH, probe-limited containment) should
# scale near-linearly; an accidental quadratic candidate path shows up
# here long before the sf0.1 numbers move.
# ---------------------------------------------------------------------------

SCALING_PROBE_QUERIES = [
    "dedup_containment",
    "dedup_cluster_canonical",
    "agg_pricing_summary",
    "dedup_embedding_lsh",
    "pipeline_decontaminate",
    "dedup_span_ngram",
]
SF1_REPLICAS = 10


def _replica_signs(r: int, dim: int = 64) -> list[int]:
    """±1 diagonal per replica (identity for replica 0). Applying one
    pattern to a whole replica preserves every within-replica dot
    product and norm exactly, while cross-replica similarities are
    scrambled — so sf1 is 10 mutually-independent copies of the sf0.1
    similarity structure, not 10× trivial self-duplicates (which would
    quadratically inflate pair outputs and measure the wrong thing)."""
    import random

    if r == 0:
        return [1] * dim
    rng = random.Random(4242 + r)
    return [rng.choice((-1, 1)) for _ in range(dim)]


def _ensure_sf1(spark, base_dir: str) -> str:
    """Generate (once, cached in the system temp dir) the three tables
    the probe queries read — documents, embeddings, lineitem — at 10×
    the base rows. Documents get a per-replica token tag (replica 0
    verbatim), which keeps each replica's shingle/near-dup structure
    identical to the base corpus while sharing no shingles across
    replicas — the same independence argument as ``_replica_signs``."""
    import functools
    import tempfile

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from iceberg_by_example_spark.sources.tpch import load_table

    out = os.path.join(tempfile.gettempdir(), "spark_graft_sf1")
    marker = os.path.join(out, "_SF1_READY")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)

    def union_all(parts):
        return functools.reduce(DataFrame.unionByName, parts)

    docs = load_table(spark, base_dir, "documents")
    doc_reps = []
    for r in range(SF1_REPLICAS):
        txt = (
            F.col("text")
            if r == 0
            else F.concat(
                F.lit(f"r{r}_"), F.regexp_replace("text", " ", f" r{r}_")
            )
        )
        doc_reps.append(
            docs.select(
                (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
                txt.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    union_all(doc_reps).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )

    emb = load_table(spark, base_dir, "embeddings")
    emb_reps = []
    for r in range(SF1_REPLICAS):
        pat = F.array(*[F.lit(v) for v in _replica_signs(r)])
        emb_reps.append(
            emb.select(
                (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
                F.zip_with(
                    "embedding", pat, lambda x, s: x * s.cast("float")
                ).alias("embedding"),
                "label",
            )
        )
    union_all(emb_reps).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )

    li = load_table(spark, base_dir, "lineitem")
    li_reps = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + r * 100_000_000)
        for r in range(SF1_REPLICAS)
    ]
    union_all(li_reps).write.mode("overwrite").parquet(
        os.path.join(out, "lineitem.parquet")
    )

    with open(marker, "w") as f:
        f.write("ok")
    return out


def _scaling_probe(spark, sf_dir: str, timings: dict[str, float]) -> dict:
    sf1_dir = _ensure_sf1(spark, sf_dir)
    queries = {}
    for name in SCALING_PROBE_QUERIES:
        spec = QUERY_REGISTRY[name]
        # min of 2 passes, +1 adaptive retry when the ratio looks
        # implausible: this box is a microVM whose host steal time can
        # inflate any single pass several-fold, which would report a
        # fake quadratic. A real quadratic reproduces on every pass;
        # a steal-time artifact doesn't survive the retry.
        base = timings.get(name)
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            run_query(spec.fn(spark, sf1_dir))
            ts.append(time.perf_counter() - t0)
            drop_pinned_blocks(spark)
        if base and min(ts) / base > 12:
            t0 = time.perf_counter()
            run_query(spec.fn(spark, sf1_dir))
            ts.append(time.perf_counter() - t0)
            drop_pinned_blocks(spark)
        dt = min(ts)
        queries[name] = {
            "sf01_sec": base,
            "sf1_sec": round(dt, 3),
            "ratio": round(dt / base, 2) if base else None,
        }
    return {"replicas": SF1_REPLICAS, "queries": queries}


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
        drop_pinned_blocks(spark)

    passes: dict[str, list[float]] = {n: [] for n in headline}
    for _ in range(3):
        for name, spec in sorted(headline.items()):
            t0 = time.perf_counter()
            run_query(spec.fn(spark, sf_dir))
            passes[name].append(time.perf_counter() - t0)
            drop_pinned_blocks(spark)

    timings = {n: round(sorted(ts)[1], 3) for n, ts in passes.items()}
    minima = {n: round(min(ts), 3) for n, ts in passes.items()}

    total = round(sum(timings.values()), 3)

    try:
        # ratio floors-vs-floors: min(sf1 passes) over min(sf0.1
        # passes) — medians mix contention into the scaling signal
        scaling = _scaling_probe(spark, sf_dir, minima)
    except Exception as exc:  # probe must never kill the bench line
        scaling = {"error": f"{type(exc).__name__}: {exc}"}

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
                "scaling_probe": scaling,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
