"""Measure what the shuffles of the heavy queries actually carry.

SCALING.md claims the wide operators exchange keys, not payloads
(16-byte digests instead of document text, band buckets instead of
signatures, fixed-width flag rows instead of corpora). This tool turns
those claims into numbers: it executes each query at sf0.1, walks the
final adaptive plan via py4j, and sums the SQLMetrics —
``shuffleBytesWritten`` per shuffle Exchange and ``dataSize`` per
BroadcastExchange — against the bytes of the parquet inputs the query
reads. The committed output is SHUFFLE_BYTES.md.

Usage: python tools/shuffle_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_by_example_spark.plans.registry import QUERY_REGISTRY, _load_all
from iceberg_by_example_spark.session import get_spark

# query -> tables it reads (for the input-bytes denominator)
QUERIES: dict[str, list[str]] = {
    "dedup_exact": ["documents"],
    "dedup_minhash_lsh": ["documents"],
    "dedup_containment": ["documents"],
    "dedup_span_ngram": ["documents"],
    "dedup_span_winnow": ["documents"],
    "dedup_block_keep_first": ["documents"],
    "dedup_exact_substring": ["documents"],
    "dedup_bloom_prefilter": ["documents"],
    "dedup_two_tier_substring": ["documents"],
    "text_bm25_topk": ["documents"],
    "sim_hybrid_rrf_topk": ["documents", "embeddings"],
    "pipeline_dsir_weights": ["documents"],
    "pipeline_dsir_resample": ["documents"],
    "text_bpe_tokenize": ["documents"],
    "dedup_source_overlap": ["documents"],
    "dedup_incremental_winnow": ["documents"],
    "dedup_threshold_sweep": ["documents"],
    "pipeline_global_shuffle": ["documents"],
    "text_quality_cdf": ["documents"],
    "text_lm_perplexity": ["documents"],
    "sim_sq8_topk": ["embeddings"],
    "sim_ivf_sq8_topk": ["embeddings"],
    "pipeline_quality_lr_step": ["documents"],
    "pipeline_quality_score": ["documents"],
    "pipeline_pack_learned": ["documents"],
    "pipeline_curate_corpus": ["documents"],
    "pipeline_curate_ingest_day": ["documents"],
    "text_unigram_tokenize": ["documents"],
    "pipeline_decontaminate": ["documents"],
    "pipeline_pack_sequences": ["documents"],
    "agg_pricing_summary": ["lineitem"],
    "join_sortmerge_facts": ["lineitem", "orders"],
    "tpch_q9_profit_by_nation": [
        "lineitem", "orders", "part", "partsupp", "supplier", "nation",
    ],
    "sim_ivf_pq_topk": ["embeddings"],
    "stream_window_topk_users": ["events"],
}


def table_bytes(sf_dir: str, tables: list[str]) -> int:
    total = 0
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total


def run_shuffle_bytes(spark) -> int:
    """Executor-cumulative shuffle-write bytes (AppStatusStore) — a
    WHOLE-RUN counter that, unlike the final-plan walk, also sees the
    stages a detach (localCheckpoint) pins away. The per-query delta
    is the `run MB` column; for pin-free queries it ~equals the plan
    walk, for detach-based ones it is the number the walk loses."""
    ex = spark._jsparkSession.sparkContext().statusStore().executorList(
        False
    )
    return sum(
        ex.apply(i).totalShuffleWrite() for i in range(ex.size())
    )


def walk_metrics(node, acc, seen=None) -> None:
    if seen is None:
        seen = set()
    name = node.nodeName()
    # ReusedExchange/ReusedSubquery SHARE the original node's metrics;
    # py4j hasattr() is always true, so without this guard the child()
    # fallback re-walks the original Exchange subtree and double-counts
    # its bytes for plans with exchange reuse (self-joins, tpch_q9).
    if name.startswith("ReusedExchange") or name.startswith("ReusedSubquery"):
        return
    try:
        nid = node.id()
        if nid in seen:
            return
        seen.add(nid)
    except Exception:
        pass
    it = node.metrics().iterator()
    vals = {}
    while it.hasNext():
        kv = it.next()
        vals[kv._1()] = kv._2().value()
    if name == "Exchange":
        acc["shuffle"] += vals.get("shuffleBytesWritten", 0)
        acc["n_shuffles"] += 1
    elif name == "BroadcastExchange":
        acc["broadcast"] += vals.get("dataSize", 0)
        acc["n_broadcasts"] += 1
    children = [node.children().apply(i) for i in range(node.children().size())]
    if name == "AdaptiveSparkPlan":
        children.append(node.executedPlan())
    if not children:
        for meth in ("plan", "child"):
            if hasattr(node, meth):
                try:
                    children.append(getattr(node, meth)())
                    break
                except Exception:
                    pass
    for c in children:
        walk_metrics(c, acc, seen)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("shuffle-report")
    _load_all()
    mb = lambda b: b / 1_048_576
    lines = [
        "# SHUFFLE_BYTES — measured exchange payloads (sf0.1)",
        "",
        "Generated by `tools/shuffle_report.py`: each query executed at",
        f"`{sf_dir}`, SQLMetrics summed over the FINAL adaptive plan.",
        "`shuffle` = total shuffleBytesWritten across hash exchanges;",
        "`broadcast` = total BroadcastExchange dataSize. `ratio` =",
        "shuffle bytes / parquet input bytes — the number that decides",
        "whether a plan moves keys or the corpus (SCALING.md's",
        "keys-not-payloads claims, measured).",
        "",
        "Read the ratios with two corrections in mind:",
        "- `documents.parquet` is ~0.6 MB COMPRESSED for ~1.5 MB of",
        "  text (plus ids/metadata), so token-level index shuffles",
        "  (span/substring/containment) reading 1-17x the compressed",
        "  bytes are ~0.4-6x the raw text SUMMED across all their",
        "  stages — O(corpus tokens) rows of fixed-width keys, the",
        "  bounded-index claim, never O(pairs) amplification. Nothing",
        "  shuffles the text column itself (plan-asserted in",
        "  tests/test_plans.py).",
        "- `broadcast MB` is the in-memory dataSize of relations AQE",
        "  chose to broadcast AT THIS TINY SF (its runtime SMJ->BHJ",
        "  conversion); at production scale those joins revert to hash",
        "  exchanges on the same keys. The structural claim this",
        "  report pins is what the SHUFFLE columns carry.",
        "- `pipeline_curate_ingest_day` is measured in its STEADY",
        "  state: the standing-state tables exist on disk (built once",
        "  by `ensure_curate_state`; the tool's first-ever run pays it",
        "  and a re-run records the daily shape), so its `run MB` is",
        "  the day's batch work + index probes — compare with the full",
        "  `pipeline_curate_corpus` row to read the incremental win.",
        "- Queries that pin an intermediate with `detach`",
        "  (localCheckpoint) report only their POST-pin lineage in the",
        "  plan-walk columns — the pinned stage's own shuffle (e.g.",
        "  exact_substring's single index shuffle on the window hash)",
        "  executes before the walked plan begins. The `run MB` column",
        "  closes that blind spot: it is the executor-cumulative",
        "  shuffle-write DELTA across the whole query run (warm-up",
        "  included), so detach-based queries that walk as 0 show",
        "  their true pre-pin exchange payload there.",
        "",
        "| query | input MB | shuffles | shuffle MB | run MB |"
        " broadcasts | broadcast MB | shuffle/input |",
        "|---|---|---|---|---|---|---|---|",
    ]
    # bench-only callables (not registry-exported) are reportable too
    import bench

    bench._load_extra_bench()

    def _fn(name):
        if name in QUERY_REGISTRY:
            return QUERY_REGISTRY[name].fn
        if name in bench.EXTRA_BENCH_FNS:
            return bench.EXTRA_BENCH_FNS[name]
        from iceberg_by_example_spark.operators import dedup

        return getattr(dedup, name)

    import time as _time

    for name, tables in QUERIES.items():
        _time.sleep(0.5)  # async listener flush before the baseline
        run0 = run_shuffle_bytes(spark)
        df = _fn(name)(spark, sf_dir)
        df.collect()
        acc = {"shuffle": 0, "broadcast": 0, "n_shuffles": 0, "n_broadcasts": 0}
        walk_metrics(df._jdf.queryExecution().executedPlan(), acc)
        _time.sleep(0.5)  # async listener flush
        run_delta = run_shuffle_bytes(spark) - run0
        inp = table_bytes(sf_dir, tables)
        ratio = acc["shuffle"] / inp if inp else float("nan")
        lines.append(
            f"| {name} | {mb(inp):.1f} | {acc['n_shuffles']} |"
            f" {mb(acc['shuffle']):.2f} | {mb(run_delta):.2f} |"
            f" {acc['n_broadcasts']} |"
            f" {mb(acc['broadcast']):.2f} | {ratio:.2f} |"
        )
        # pinned blocks from detach-based queries
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(True)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SHUFFLE_BYTES.md",
    )
    # preserve the Composition section tools/composition_report.py owns
    tail = ""
    if os.path.exists(out):
        old = open(out).read()
        i = old.find("## Composition —")
        if i != -1:
            tail = "\n" + old[i:]
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n" + tail)
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
