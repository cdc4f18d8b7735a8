"""Invariant tests for the LLM-data operators: mathematical properties
(recall on planted duplicates, signature agreement, funnel accounting,
codec round-trips) that complement the row/schema/hash driver check —
and, for the unregistered engine-specific variants (the KMeans-trained
IVF, the native DataSketches/HLL++ estimators), the only check there
is. The registered twins of all of those are oracle-checked.
"""

import pytest
from pyspark.sql import functions as F

from iceberg_by_example_spark.operators.dedup import (
    MINHASH_PERMS,
    minhash_signatures,
)
from iceberg_by_example_spark.operators.multimodal import (
    DECODED_SCHEMA,
    decode_binary_batches,
)

DOC_A = "the quick brown fox jumps over the lazy dog near the river bank today"
DOC_B = "the quick brown fox jumps over the lazy dog near the river bank tonight"
DOC_C = "completely different words about spark query engines and parquet files here"


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, DOC_A), (2, DOC_A), (3, DOC_B), (4, DOC_C)],
        "doc_id long, text string",
    )


def _signatures(docs):
    rows = minhash_signatures(docs).collect()
    return {r["doc_id"]: r["sig"] for r in rows}


def test_minhash_identical_docs_identical_signatures(docs):
    sigs = _signatures(docs)
    assert sigs[1] == sigs[2]
    assert len(sigs[1]) == MINHASH_PERMS


def test_minhash_similar_docs_mostly_agree(docs):
    """DOC_A/DOC_B differ by one trailing token: true 3-shingle Jaccard
    ≈ 0.75, so most signature positions must agree; an unrelated doc
    must agree almost nowhere."""
    sigs = _signatures(docs)
    agree_ab = sum(x == y for x, y in zip(sigs[1], sigs[3])) / MINHASH_PERMS
    agree_ac = sum(x == y for x, y in zip(sigs[1], sigs[4])) / MINHASH_PERMS
    assert agree_ab > 0.5
    assert agree_ac < 0.25
    assert agree_ab > agree_ac


def test_minhash_lsh_finds_near_dups(spark, tmp_path):
    """End-to-end: a corpus with a planted near-duplicate pair must
    surface exactly that pair as a candidate."""
    from iceberg_by_example_spark.operators.dedup import dedup_minhash_lsh

    corpus = spark.createDataFrame(
        [(i, DOC_C.replace("spark", f"w{i}")) for i in range(10)]
        + [(100, DOC_A), (101, DOC_B)],
        "doc_id long, text string",
    )
    sf_dir = str(tmp_path)
    corpus.write.parquet(f"{sf_dir}/documents.parquet")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert (100, 101) in pairs


def test_ngram_df_cap_bounds_hot_shingle(spark, tmp_path):
    """A planted boilerplate shingle shared by EVERY doc must not blow
    up candidate generation: with the cap below its document frequency
    the hot shingle contributes zero pairs, and surviving pairs keep
    their exact (uncapped) Jaccard."""
    from iceberg_by_example_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "terms and conditions apply"
    corpus = spark.createDataFrame(
        [(i, f"unique{i} alpha{i} beta{i} {boiler}") for i in range(20)]
        + [(100, DOC_A + " " + boiler), (101, DOC_B + " " + boiler)],
        "doc_id long, text string",
    )
    sf_dir = str(tmp_path)
    corpus.write.parquet(f"{sf_dir}/documents.parquet")
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(spark, sf_dir, df_cap=5).collect()
    }
    uncapped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(spark, sf_dir, df_cap=10**6).collect()
    }
    # boilerplate-only pairs are generated without the cap...
    assert any(a < 100 and b < 100 for a, b in uncapped)
    # ...and fully suppressed with it: every filler doc pairs with every
    # other only through the hot shingles.
    assert not any(a < 100 and b < 100 for a, b in capped)
    # the true near-dup pair survives, with the exact uncapped Jaccard
    assert (100, 101) in capped
    assert capped[(100, 101)] == uncapped[(100, 101)]


def test_simhash_hamming_properties(spark, tmp_path):
    """Identical docs → hamming 0; near-identical → candidates."""
    from iceberg_by_example_spark.operators.dedup import dedup_simhash

    corpus = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_A), (3, DOC_B)], "doc_id long, text string"
    )
    sf_dir = str(tmp_path)
    corpus.write.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup_simhash(spark, sf_dir).collect()
    }
    assert got[(1, 2)] == 0
    assert (1, 3) in got and got[(1, 3)] <= 6


def test_multimodal_decode_batches(spark):
    """The mapInPandas decode path: batch shape, schema, determinism."""
    df = spark.createDataFrame(
        [(1, bytearray(b"x" * 100)), (2, bytearray(b"y" * 300))],
        "doc_id long, payload binary",
    )
    out = df.mapInPandas(decode_binary_batches, DECODED_SCHEMA)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["payload_bytes"] == 100
    assert rows[1]["width"] == 64 + 100 % 64
    assert rows[2]["height"] == 64 + (300 // 64) % 64
    assert rows[1]["channels"] == 3
    # determinism: second run identical
    rows2 = {r["doc_id"]: r for r in out.collect()}
    assert rows == rows2


def test_ivf_ann_consistent_with_bruteforce(spark):
    """IVF probe scores must equal brute-force cosines for any vec_id
    both return — clustering changes recall, never scores."""
    from iceberg_by_example_spark.operators.similarity import (
        sim_ivf_topk,
        sim_topk_cosine,
    )

    sf = "/root/testdata/sf0.001"
    brute = {
        r["vec_id"]: r["cosine"] for r in sim_topk_cosine(spark, sf).collect()
    }
    ivf = {r["vec_id"]: r["cosine"] for r in sim_ivf_topk(spark, sf).collect()}
    assert ivf, "IVF probe returned nothing"
    for vec_id, cos in ivf.items():
        if vec_id in brute:
            assert cos == brute[vec_id]


def test_lsh_ann_consistent_with_bruteforce(spark):
    """Every (vec_id, cosine) the LSH probe returns must equal the
    brute-force cosine for that vec_id — LSH changes recall, never
    scores."""
    from iceberg_by_example_spark.operators.similarity import (
        sim_lsh_ann_topk,
        sim_topk_cosine,
    )

    sf = "/root/testdata/sf0.001"
    brute = {
        r["vec_id"]: r["cosine"]
        for r in sim_topk_cosine(spark, sf).collect()
    }
    ann = {
        r["vec_id"]: r["cosine"] for r in sim_lsh_ann_topk(spark, sf).collect()
    }
    for vec_id, cos in ann.items():
        if vec_id in brute:
            assert cos == brute[vec_id]


def test_dedup_pipeline_finds_planted_dups(spark, tmp_path):
    """End-to-end LSH→verify pipeline: planted near-dup recovered with
    its exact Jaccard; unrelated docs absent."""
    from iceberg_by_example_spark.operators.dedup import (
        dedup_pipeline_lsh_verified,
    )

    corpus = spark.createDataFrame(
        [(i, DOC_C.replace("spark", f"w{i}")) for i in range(10)]
        + [(100, DOC_A), (101, DOC_B)],
        "doc_id long, text string",
    )
    sf_dir = str(tmp_path)
    corpus.write.parquet(f"{sf_dir}/documents.parquet")
    rows = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dedup_pipeline_lsh_verified(spark, sf_dir).collect()}
    assert (100, 101) in rows
    assert 0.5 <= rows[(100, 101)] < 1.0


def test_cluster_canonical_transitive_chain(spark, tmp_path):
    """Connected components must close over TRANSITIVE similarity: a
    chain A~B~C where A and C are not directly similar is ONE cluster
    (this is what per-pair dedup gets wrong), and the canonical id is
    the component minimum. Requires ≥2 propagation rounds — A's label
    reaches C only through B."""
    from iceberg_by_example_spark.operators.dedup import (
        dedup_cluster_canonical,
    )

    toks = [f"tok{i}" for i in range(40)]
    docs = [
        (1, " ".join(toks[0:20])),    # A
        (2, " ".join(toks[5:25])),    # B: jaccard(A,B) = 13/23 ≈ 0.57
        (3, " ".join(toks[10:30])),   # C: jaccard(B,C) ≈ 0.57, (A,C) ≈ 0.29
        (9, " ".join(f"zz{i}" for i in range(30))),  # unrelated
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup_cluster_canonical(spark, str(tmp_path)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}, got


def test_split_hash_partitions_and_proportions(spark):
    """The hash split covers every doc exactly once, lands near
    80/10/10, and is a pure function of doc_id (recompute-identical)."""
    from iceberg_by_example_spark.operators.sampling import (
        pipeline_split_hash,
    )

    sf = "/root/testdata/sf0.01"
    out = pipeline_split_hash(spark, sf)
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n = sum(counts.values())
    assert n == out.select("doc_id").distinct().count() == 500
    assert 0.72 <= counts["train"] / n <= 0.88
    assert counts["val"] / n <= 0.16 and counts["test"] / n <= 0.16
    again = {
        r["doc_id"]: r["split"] for r in pipeline_split_hash(spark, sf).collect()
    }
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert first == again


def test_stratified_sample_exact_per_stratum(spark):
    """Every language stratum contributes exactly ceil(0.2 * n)."""
    import math

    from iceberg_by_example_spark.operators.sampling import (
        pipeline_stratified_sample,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    sf = "/root/testdata/sf0.01"
    strata = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {
        r["lang"]: r["n"]
        for r in pipeline_stratified_sample(spark, sf)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == {k: math.ceil(0.2 * v) for k, v in strata.items()}


def test_pack_sequences_conserves_tokens(spark):
    """Packing is a partition of the corpus: pack token sums and doc
    counts reconstruct the totals, and every pack starts below the
    budget boundary (the defining invariant of prefix-sum packing)."""
    from iceberg_by_example_spark.functions.text import token_count
    from iceberg_by_example_spark.operators.sampling import (
        pipeline_pack_sequences,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    sf = "/root/testdata/sf0.01"
    d = load_table(spark, sf, "documents")
    total_docs = d.count()
    total_tokens = (
        d.select(token_count("text").alias("t")).agg(F.sum("t")).collect()[0][0]
    )
    packs = pipeline_pack_sequences(spark, sf).collect()
    assert sum(p["n_docs"] for p in packs) == total_docs
    assert sum(p["pack_tokens"] for p in packs) == total_tokens
    # pack ids per source are dense from 0 (no empty packs)
    by_src = {}
    for p in packs:
        by_src.setdefault(p["source"], []).append(p["pack_id"])
    for ids in by_src.values():
        assert sorted(ids) == list(range(len(ids)))


def test_domain_mix_weights_and_caps(spark):
    """Target weights sum to 1; rates cap at 1; effective tokens never
    exceed what the source has."""
    from iceberg_by_example_spark.operators.sampling import (
        pipeline_domain_mix,
    )

    rows = pipeline_domain_mix(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 20
    assert abs(sum(r["target_weight"] for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert 0 < r["sample_rate"] <= 1.0
        assert r["effective_tokens"] <= r["source_tokens"] + 1e-9


def test_quantize_int8_zero_vector_matches_oracle(spark, tmp_path):
    """An all-zero embedding has scale 0; unguarded x/scale is NaN and
    the engines disagree on floor(NaN). The guard quantizes it to the
    all-zero int vector — identically in Spark and the DuckDB oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_by_example_spark.plans.registry import (
        QUERY_REGISTRY,
        _load_all,
    )

    _load_all()

    tbl = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array(
                [[0.0, 0.0, 0.0], [1.0, -2.0, 0.5], [127.0, -127.0, 63.5]],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0, 1, 2], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    spec = QUERY_REGISTRY["embed_quantize_int8"]
    srows = {
        r["vec_id"]: r for r in spec.fn(spark, str(tmp_path)).collect()
    }
    assert srows[1]["scale"] == 0.0
    assert srows[1]["q_sum"] == 0 and srows[1]["q_l1"] == 0
    assert srows[1]["n_saturated"] == 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    orows = {r[0]: r for r in con.execute(spec.oracle).fetchall()}
    for vid in (1, 2, 3):
        s, o = srows[vid], orows[vid]
        assert (s["scale"], s["q_sum"], s["q_l1"], s["n_saturated"]) == (
            o[2], o[3], o[4], o[5],
        ), f"vec {vid}: spark={s} oracle={o}"


def test_decontaminate_flags_planted_benchmark_copy(spark, tmp_path):
    """A training doc that copies a benchmark doc's text must be
    flagged; an unrelated doc must not appear in the overlap at all."""
    from iceberg_by_example_spark.operators.pipeline import (
        DECON_BENCH_BUCKET,
        pipeline_decontaminate,
    )
    from iceberg_by_example_spark.operators.sampling import hash_bucket

    base = spark.range(600).select(F.col("id").alias("doc_id"))
    bucketed = {
        r["doc_id"]: r["b"]
        for r in base.select(
            "doc_id", hash_bucket(F.col("doc_id"), "bench").alias("b")
        ).collect()
    }
    bench_ids = [i for i, b in bucketed.items() if b < DECON_BENCH_BUCKET]
    train_ids = [i for i, b in bucketed.items() if b >= DECON_BENCH_BUCKET]
    assert bench_ids and len(train_ids) > 2
    bench_text = "the quick brown fox jumps over the lazy dog every day"
    copycat, clean = train_ids[0], train_ids[1]
    rows = []
    for i in bench_ids:
        rows.append((i, bench_text))
    for i in train_ids:
        if i == copycat:
            rows.append((i, "prefix words then " + bench_text))
        else:
            rows.append((i, f"totally distinct corpus{i} body{i} text{i} one{i} two{i} three{i} four{i}"))
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["doc_id"]: r
        for r in pipeline_decontaminate(spark, str(tmp_path)).collect()
    }
    assert got[copycat]["contaminated"]
    assert clean not in got


def test_label_propagation_chain_converges_logarithmically(spark):
    """A 300-node chain is the worst case for plain min-label
    propagation (diameter 299 > the 50-round cap); pointer jumping must
    close it in O(log n) rounds — the test converging at all under the
    cap proves the jump works — with every node labeled by the chain's
    minimum, and a second disjoint component keeping its own label."""
    from iceberg_by_example_spark.operators.dedup import (
        min_label_components,
    )

    chain = [(i, i + 1) for i in range(299)]
    other = [(1000, 1001), (1001, 1002)]
    pairs = spark.createDataFrame(chain + other, "a long, b long")
    edges = pairs.selectExpr("a AS u", "b AS v").unionByName(
        pairs.selectExpr("b AS u", "a AS v")
    )
    got = {r["id"]: r["label"] for r in min_label_components(edges).collect()}
    assert len(got) == 303
    assert all(got[i] == 0 for i in range(300))
    assert all(got[i] == 1000 for i in (1000, 1001, 1002))


def test_span_dedup_catches_shared_paragraph(spark, tmp_path):
    """Two long docs sharing one verbatim 30-token run — a small
    fraction of each, so Jaccard AND containment both stay far under
    their thresholds — must surface as a span-dedup pair; unrelated
    docs must not."""
    from iceberg_by_example_spark.plans.registry import (
        QUERY_REGISTRY,
        _load_all,
    )

    _load_all()
    quoted = " ".join(f"quote{i}" for i in range(30))
    a_body = " ".join(f"alpha{i}" for i in range(150))
    b_body = " ".join(f"beta{i}" for i in range(150))
    rows = [
        (1, a_body + " " + quoted),
        (2, quoted + " " + b_body),
        (3, " ".join(f"gamma{i}" for i in range(180))),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    spans = {
        (r["doc_a"], r["doc_b"]): r["shared_spans"]
        for r in QUERY_REGISTRY["dedup_span_ngram"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert (1, 2) in spans and spans[(1, 2)] >= 1
    assert all(3 not in pair for pair in spans)
    # the shared run is <20% of either doc: containment can't see it
    cont = (
        QUERY_REGISTRY["dedup_containment"]
        .fn(spark, str(tmp_path))
        .collect()
    )
    assert not [r for r in cont if {r["doc_a"], r["doc_b"]} == {1, 2}]


def test_repetition_stats_flag_degenerate_docs(spark, tmp_path):
    """A looping doc must be flagged by either repetition signal; a
    diverse doc must not. Exact fractions checked against hand
    arithmetic."""
    from iceberg_by_example_spark.plans.registry import (
        QUERY_REGISTRY,
        _load_all,
    )

    _load_all()
    rows = [
        (1, "spam ham " * 50),  # top bigram dominates
        (2, " ".join(f"w{i}" for i in range(100))),  # all distinct
    ]
    rows = [(i, t.strip()) for i, t in rows]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["doc_id"]: r
        for r in QUERY_REGISTRY["text_repetition_stats"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got[1]["flagged"] and not got[2]["flagged"]
    assert got[1]["dup_token_frac"] == 1 - 2 / 100
    # "spam ham" 50×, "ham spam" 49× → top 50 of 99 bigrams
    assert abs(got[1]["top_bigram_frac"] - 50 / 99) < 1e-12
    assert got[2]["dup_token_frac"] == 0.0


def test_image_decode_probe_gates_real_codec():
    """The decode path is probe-gated like the avro delete-format
    probe: with Pillow present, real image bytes decode for real (and
    non-image bytes still fall back to the deterministic stub, keeping
    graded text-payload queries stable); without Pillow, everything
    stub-decodes. Asserted whichever environment runs the suite."""
    from iceberg_by_example_spark.operators import multimodal as mm

    text_payload = "not an image, just bytes".encode()
    assert mm._decode_image(text_payload) == mm._decode_image_stub(
        text_payload
    )
    if mm._PIL is not None:
        import io

        buf = io.BytesIO()
        mm._PIL.new("RGB", (5, 3), (10, 20, 30)).save(buf, format="PNG")
        w, h, c, mean = mm._decode_image(buf.getvalue())
        assert (w, h, c) == (5, 3, 3)
        assert abs(mean - 20.0) < 1e-9
    else:
        # stub dimensions are a pure function of payload length
        n = len(text_payload)
        assert mm._decode_image(text_payload)[:2] == (
            64 + n % 64,
            64 + (n // 64) % 64,
        )


def test_bmp_codec_roundtrip_and_chain_preference():
    """The in-container BMP codec must invert the encoder exactly —
    dims, channels, and the exact-integer mean — including non-trivial
    row padding (width not a multiple of 4), and ``_decode_image``
    must prefer it over the stub while rejecting non-BMP bytes."""
    import numpy as np

    from iceberg_by_example_spark.operators import multimodal as mm

    for w, h in ((5, 3), (32, 24), (7, 2)):  # 5 and 7 exercise padding
        arr = (
            (np.arange(h * w * 3, dtype=np.uint32) * 37 + 11) % 256
        ).astype("uint8").reshape(h, w, 3)
        payload = mm._encode_bmp(arr)
        got = mm._decode_bmp(payload)
        assert got is not None
        gw, gh, gc, gmean = got
        expect = float(int(arr.sum(dtype="uint64"))) / (w * h * 3)
        assert (gw, gh, gc) == (w, h, 3)
        assert gmean == expect  # exact: integer sum, one division
        # the full decode chain picks the real codec, not the stub
        if mm._PIL is None:
            assert mm._decode_image(payload) == got
    assert mm._decode_bmp(b"not a bitmap at all") is None
    assert mm._decode_bmp(b"BM" + b"\x00" * 10) is None


def test_incremental_minhash_is_cross_slice_of_full(spark):
    """The incremental probe must equal the FULL minhash-LSH pair set
    restricted to batch↔corpus pairs — never a batch↔batch or
    corpus↔corpus pair, never a missing or extra cross pair, identical
    signature-agreement scores."""
    from iceberg_by_example_spark.operators.dedup import (
        INCR_MINHASH_BATCH_SOURCE,
        dedup_incremental_minhash,
        dedup_minhash_lsh,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    sf = "/root/testdata/sf0.01"
    src = {
        r.doc_id: r.source
        for r in load_table(spark, sf, "documents")
        .select("doc_id", "source")
        .collect()
    }
    full = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in dedup_minhash_lsh(spark, sf).collect()
    }
    batch = INCR_MINHASH_BATCH_SOURCE
    want = {
        tuple(sorted(p)): j
        for p, j in full.items()
        if (src[p[0]] == batch) != (src[p[1]] == batch)
    }
    got = {
        tuple(sorted((r.batch_doc, r.corpus_doc))): r.est_jaccard
        for r in dedup_incremental_minhash(spark, sf).collect()
    }
    for pair in got:
        a, b = pair
        assert (src[a] == batch) != (src[b] == batch)
    assert got == want


def test_wav_codec_roundtrip_and_chunk_walk():
    """The WAV codec must invert the encoder exactly and the parser
    must WALK chunks (tolerate a chunk between fmt and data) rather
    than assume the canonical 44-byte layout; non-WAV and compressed
    payloads are rejected."""
    import struct

    import numpy as np

    from iceberg_by_example_spark.operators import multimodal as mm

    s = mm._audio_samples(3)
    rate, got = mm._decode_wav(mm._encode_wav(s))
    assert rate == mm._AUDIO_RATE
    assert np.array_equal(got, s)

    # inject a LIST chunk between fmt and data — still decodable
    payload = mm._encode_wav(s)
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 4) + b"info"
    patched = payload[:fmt_end] + extra + payload[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate2, got2 = mm._decode_wav(patched)
    assert rate2 == rate and np.array_equal(got2, s)

    assert mm._decode_wav(b"not riff audio") is None
    assert mm._decode_wav(b"RIFF\x00\x00\x00\x00WAVE") is None


def test_components_driver_and_distributed_paths_agree(spark):
    """The adaptive strategy gate must be invisible in the answer: the
    driver-side union-find (small graphs) and the distributed
    pointer-jumping loop must label an identical component structure —
    chains, a clique, a star, singleton-free isolates all mixed."""
    from iceberg_by_example_spark.operators.dedup import (
        components_adaptive,
        min_label_components,
    )
    from pyspark.sql import functions as F

    pair_list = (
        [(i, i + 1) for i in range(10, 40)]  # chain
        + [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]
        + [(200, x) for x in range(201, 220)]  # star
        + [(500, 501)]
    )
    pairs = spark.createDataFrame(
        pair_list, "doc_a long, doc_b long"
    ).localCheckpoint(eager=True)
    via_driver = {
        (r["id"], r["label"])
        for r in components_adaptive(spark, pairs).collect()
    }
    edges = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    via_cluster = {
        (r["id"], r["label"])
        for r in min_label_components(edges).collect()
    }
    assert via_driver == via_cluster
    assert (10, 10) in via_driver and (39, 10) in via_driver
    assert all(lab == 100 for i, lab in via_driver if 100 <= i < 105)


def test_dedup_keep_best_prefers_longest_copy(spark, tmp_path):
    """Copies normalize to the same fingerprint but differ in raw
    tokens; keep-best must pick the most-token copy (NOT the lowest
    id, which keep-first would), tie-breaking equal lengths by id."""
    from iceberg_by_example_spark.plans.registry import (
        QUERY_REGISTRY,
        _load_all,
    )

    _load_all()
    # Normalization collapses whitespace + case, so copies share a
    # fingerprint while RAW single-space-split token counts differ
    # ("a  b" splits to 3 tokens, "a b" to 2).
    rows = [
        (10, "alpha beta gamma"),        # fp X, 3 tokens
        (11, "alpha  beta   gamma"),     # fp X, 6 raw split tokens
        (12, "ALPHA BETA GAMMA"),        # fp X, 3 tokens
        (20, "unique text here"),        # fp Y, alone
        (30, "tie one two"),             # fp Z, 3 tokens
        (31, "TIE ONE TWO"),             # fp Z, 3 tokens -> lower id 30
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    spec = QUERY_REGISTRY["dedup_exact_keep_best"]
    kept = sorted(
        r["doc_id"] for r in spec.fn(spark, str(tmp_path)).collect()
    )
    assert kept == [11, 20, 30]
    # and the oracle agrees on the same corpus
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    assert sorted(r[0] for r in con.execute(spec.oracle).fetchall()) == kept


def test_containment_catches_embedded_copy_jaccard_misses(spark, tmp_path):
    """A short doc fully quoted inside a much longer one: containment
    must flag the pair even though its Jaccard is far below any dedup
    threshold."""
    from iceberg_by_example_spark.plans.registry import (
        QUERY_REGISTRY,
        _load_all,
    )

    _load_all()
    short = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"filler{i} pad{i} word{i}" for i in range(60))
    rows = [
        (1, short),
        (2, filler + " " + short + " " + filler[::-1].lower()),
        (3, "totally unrelated content body here nine distinct words"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in QUERY_REGISTRY["dedup_containment"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERY_REGISTRY["dedup_ngram_jaccard"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert cont[(1, 2)] == 1.0  # fully contained
    assert jac.get((1, 2), 0.0) < 0.1  # jaccard can't see it
    assert (1, 3) not in cont and (2, 3) not in cont


def test_containment_candidates_bounded_by_rarest_probes(spark):
    """The probe budget bounds candidate generation: docs that share
    ONLY a hot boilerplate shingle (each having ≥B rarer unique
    shingles that outrank it) produce ZERO candidate pairs — the
    old full self-join would have produced all O(m²) of them — while a
    genuinely contained doc still surfaces via its rare probes."""
    from iceberg_by_example_spark.operators.dedup import (
        CONTAINMENT_RAREST_B,
        _containment_candidates,
        _shingle_sets,
    )

    boiler = "terms and conditions apply"
    m = 8
    rows = [
        # Each doc: shared boilerplate + > B unique (df=1) shingles.
        (
            i,
            boiler
            + " "
            + " ".join(
                f"u{i}w{j}" for j in range(CONTAINMENT_RAREST_B + 10)
            ),
        )
        for i in range(m)
    ]
    # Doc 100 is fully contained in doc 0 (its unique tail quoted).
    rows.append((100, " ".join(f"u0w{j}" for j in range(8))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = _shingle_sets(docs).localCheckpoint(eager=True)
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in _containment_candidates(sh).collect()
    }
    assert (0, 100) in cand, "contained doc must stay a candidate"
    boiler_only = {
        (a, b) for (a, b) in cand if a < 100 and b < 100 and a != b
    }
    assert not boiler_only, (
        f"hot-shingle-only pairs must be pruned, got {boiler_only}"
    )


def test_epoch_plan_realizes_mix_within_cap(spark):
    """Epoch counts reproduce the target token mix exactly for
    unclipped sources (epochs x source_tokens / total == weight), never
    exceed the repeat ceiling, and flag exactly the sources whose
    demanded repetition was clipped."""
    from iceberg_by_example_spark.operators.sampling import (
        MAX_EPOCHS,
        pipeline_epoch_plan,
    )

    rows = pipeline_epoch_plan(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 20
    total = sum(r["source_tokens"] for r in rows)
    for r in rows:
        assert 0 < r["epochs"] <= MAX_EPOCHS
        assert r["clipped"] == (
            r["target_weight"] * total / r["source_tokens"] > MAX_EPOCHS
        )
        if not r["clipped"]:
            realized = r["planned_tokens"] / total
            assert abs(realized - r["target_weight"]) < 1e-9


def test_user_sessions_gap_cut_and_single_shuffle(spark, tmp_path):
    """A >30-min gap opens a new session; smaller gaps extend the
    current one. The whole operator must plan exactly ONE exchange
    (lag, running counter, and per-session agg all key on user_id)."""
    import datetime as dt

    from iceberg_by_example_spark.plans.analytics import events_user_sessions

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(i, user, minutes):
        return (i, t0 + dt.timedelta(minutes=minutes), user, "click", 1.0)

    rows = [
        ev(1, 10, 0),
        ev(2, 10, 10),  # 10-min gap: same session
        ev(3, 10, 50),  # 40-min gap: new session
        ev(4, 20, 0),  # other user: own session
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    sf_dir = str(tmp_path)
    events.write.parquet(f"{sf_dir}/events.parquet")

    out = events_user_sessions(spark, sf_dir)
    # read the plan BEFORE executing: post-collect AQE re-planning
    # inserts bookkeeping nodes that double-count the one exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.duration_s)
        for r in out.collect()
    }
    assert got == {
        (10, 1): (2, 600),  # events 1+2, 10 minutes long
        (10, 2): (1, 0),
        (20, 1): (1, 0),
    }


def test_filter_funnel_first_failure_attribution(spark, tmp_path):
    """Stage counts sum to the corpus and a doc failing several
    filters is charged to the FIRST one (funnel semantics)."""
    from iceberg_by_example_spark.operators.pipeline import (
        pipeline_filter_funnel,
    )

    short_and_repetitive = "spam " * 9 + "spam"  # 10 tokens, 1 distinct
    diverse_long = " ".join(
        f"the w{3 * i} and w{3 * i + 1} of w{3 * i + 2}" for i in range(8)
    )  # 48 tokens, 27 distinct (ttr 0.56), half stopwords
    low_ttr_long = ("alpha beta " * 16).strip()  # 32 tokens, 2 distinct
    docs = spark.createDataFrame(
        [
            (1, short_and_repetitive, "en", "s", 1),
            (2, diverse_long, "en", "s", 1),
            (3, low_ttr_long, "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path)
    docs.write.parquet(f"{sf_dir}/documents.parquet")

    rows = {r.stage: r for r in pipeline_filter_funnel(spark, sf_dir).collect()}
    assert sum(r.n_docs for r in rows.values()) == 3
    # doc 1 fails BOTH length and diversity -> charged to too_short only
    assert rows["too_short"].n_docs == 1
    assert rows["low_diversity"].n_docs == 1
    assert rows["kept"].n_docs == 1
    assert abs(sum(r.pct_of_total for r in rows.values()) - 1.0) < 1e-9


def test_embedding_lsh_pairs_are_subset_of_exact_with_same_scores(spark):
    """The bucketed near-dup's pairs must be a SUBSET of the exact
    all-pairs result with identical cosines (bucketing changes recall,
    never scores), and co-bucketed high-cosine pairs must exist."""
    from iceberg_by_example_spark.operators.similarity import (
        dedup_embedding_cosine,
        dedup_embedding_lsh,
    )

    sf = "/root/testdata/sf0.001"
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in dedup_embedding_cosine(spark, sf).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b): r.cosine
        for r in dedup_embedding_lsh(spark, sf).collect()
    }
    assert lsh, "LSH dedup found no pairs"
    for pair, cos in lsh.items():
        assert pair in exact
        assert cos == exact[pair]


def test_random_projection_preserves_norms_in_expectation(spark):
    """JL sanity: for a ±1 projection, E[‖Px‖²] = k·‖x‖², so the
    per-vector ratio ‖Px‖²/(k·‖x‖²) is χ²_k/k-shaped — individually
    near 1 and very near 1 on average. (A stronger per-PAIR ordering
    check would be wrong: i.i.d. normal embeddings concentrate all
    pairwise distances, so a 4× reduction can legitimately flip one
    near/far pair.)"""
    from iceberg_by_example_spark.operators.similarity import (
        QUANT,
        RP_OUT_DIM,
        random_projection_vectors,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    sf = "/root/testdata/sf0.001"
    orig = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf, "embeddings").limit(50).collect()
    }
    proj = {
        r.vec_id: [v / QUANT for v in r.rp_q]
        for r in random_projection_vectors(spark, sf).collect()
        if r.vec_id in orig
    }
    ratios = [
        sum(v * v for v in proj[i])
        / (RP_OUT_DIM * sum(v * v for v in orig[i]))
        for i in orig
    ]
    assert all(0.2 < r < 2.5 for r in ratios)
    mean = sum(ratios) / len(ratios)
    assert 0.85 < mean < 1.15


def test_ivf_pq_rerank_consistent_with_bruteforce(spark):
    """IVF-PQ's exact re-rank must return true cosines: for any vec_id
    both return, the PQ path's cosine equals brute force (PQ changes
    recall and candidate cost, never the re-ranked scores), and its
    ADC distances are non-negative integers."""
    from iceberg_by_example_spark.operators.similarity import (
        sim_ivf_pq_topk,
        sim_topk_cosine,
    )

    sf = "/root/testdata/sf0.001"
    brute = {
        r["vec_id"]: r["cosine"] for r in sim_topk_cosine(spark, sf).collect()
    }
    pq = sim_ivf_pq_topk(spark, sf).collect()
    assert pq, "IVF-PQ probe returned nothing"
    for r in pq:
        assert r["adc"] >= 0
        if r["vec_id"] in brute:
            assert r["cosine"] == brute[r["vec_id"]]
    # recall floor: the score-equality check alone would pass with zero
    # overlap; pin that the approximate path actually finds part of the
    # true top-10. Measured recall@10 is 3 at sf0.001 (500 vectors,
    # NPROBE 4 of 16 cells — true neighbors land in unprobed cells on a
    # corpus this small) and 5 at sf0.01; floor at the measured value so
    # a regression to zero-overlap can never pass again.
    overlap = {r["vec_id"] for r in pq} & set(brute)
    assert len(overlap) >= 3, f"PQ recall@10 too low: {sorted(overlap)}"


def test_sim_sq8_matches_duckdb_twin(spark, sf_dir):
    """_SQ8_ORACLE (the queued registration oracle) must reproduce
    the full approximate path bit-for-bit — int8 codes, the coarse
    code-cosine shortlist boundary, and the exact re-rank."""
    import duckdb

    from iceberg_by_example_spark.operators.similarity import (
        _SQ8_ORACLE,
        sim_sq8_topk,
    )

    got = [
        (r["vec_id"], r["label"], r["code_cos"], r["cosine"])
        for r in sim_sq8_topk(spark, sf_dir).collect()
    ]
    assert len(got) == 10
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = [
        (v, lbl, cc, c)
        for v, lbl, cc, c in con.execute(_SQ8_ORACLE).fetchall()
    ]
    assert got == want


def test_sim_sq8_refine_exact_and_recall(spark):
    """The SQ8 re-rank must return TRUE cosines (quantization changes
    the shortlist, never the re-ranked scores), and the coded path
    must recover essentially the whole exact top-10 — per-vector
    absmax int8 perturbs each component by <= scale/2 ≈ 0.4% of
    absmax, far below this corpus's neighbor gaps (measured
    recall@10 = 10 at sf0.001; floor at 8 so a real quantization
    regression fails while an unlucky boundary pair or two cannot)."""
    from iceberg_by_example_spark.operators.similarity import (
        sim_sq8_topk,
        sim_topk_cosine,
    )

    sf = "/root/testdata/sf0.001"
    brute = {
        r["vec_id"]: r["cosine"]
        for r in sim_topk_cosine(spark, sf).collect()
    }
    sq8 = sim_sq8_topk(spark, sf).collect()
    assert len(sq8) == 10
    for r in sq8:
        assert -1.0 <= r["code_cos"] <= 1.0
        if r["vec_id"] in brute:
            assert r["cosine"] == brute[r["vec_id"]]
    overlap = {r["vec_id"] for r in sq8} & set(brute)
    assert len(overlap) >= 8, f"SQ8 recall@10 too low: {sorted(overlap)}"


def test_sim_ivf_sq8_matches_duckdb_twin_and_cell_bound(spark, sf_dir):
    """The stacked IVF-SQ8 index: (a) the DuckDB twin reproduces the
    whole path — cell assignment, probe selection, codes-only coarse
    scan, exact re-rank — bit-for-bit; (b) every returned row's cell
    is one of the query's NPROBE probe cells (the WHICH bound is a
    result property, not prose); (c) re-ranked cosines are TRUE
    cosines (equal to the IVF full-vector path for shared ids)."""
    import duckdb

    from iceberg_by_example_spark.operators.similarity import (
        IVF_NPROBE,
        _ivf_sq8_oracle,
        sim_ivf_sq8_topk,
        sim_ivf_topk,
    )

    rows = sim_ivf_sq8_topk(spark, sf_dir).collect()
    assert len(rows) == 10
    got = [
        (r["vec_id"], r["label"], r["cell"], r["code_cos"], r["cosine"])
        for r in rows
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = [tuple(t) for t in con.execute(_ivf_sq8_oracle()).fetchall()]
    assert got == want
    assert len({r["cell"] for r in rows}) <= IVF_NPROBE
    ivf = {
        r["vec_id"]: r["cosine"]
        for r in sim_ivf_topk(spark, sf_dir).collect()
    }
    shared = [r for r in rows if r["vec_id"] in ivf]
    assert shared, "no overlap with the full-vector IVF path"
    for r in shared:
        assert r["cosine"] == ivf[r["vec_id"]]


def test_sq8_encode_batches_matches_expressions(spark, sf_dir):
    """Pin the numpy batch encoder to the expression forms DIRECTLY,
    per-row over the whole corpus — the twin tests compare only the
    final top-10, so a drift in codes/cells of non-shortlisted
    vectors would pass them silently: scale and qv must equal
    ``_sq8_encoded``'s, cell must equal ``_ivf_key``'s injective
    argmin, and the query row's probe_cells must equal the
    expression-form NPROBE selection."""
    from pyspark.sql import functions as F

    from iceberg_by_example_spark.operators.similarity import (
        IVF_K,
        IVF_NPROBE,
        SQ8_ENCODE_SCHEMA,
        _ivf_key,
        _sq8_encoded,
        sq8_encode_batches,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    e = load_table(spark, sf_dir, "embeddings")
    got = {
        r["vec_id"]: r
        for r in e.select("vec_id", "label", "embedding")
        .mapInPandas(sq8_encode_batches, SQ8_ENCODE_SCHEMA)
        .collect()
    }
    keys = F.array(
        *[_ivf_key(F.col("embedding"), k) for k in range(IVF_K)]
    )
    want = {
        r["vec_id"]: r
        for r in _sq8_encoded(e)
        .select(
            "vec_id",
            "scale",
            "qv",
            (F.array_min(keys) % IVF_K).alias("cell"),
            F.transform(
                F.slice(F.array_sort(keys), 1, IVF_NPROBE),
                lambda x: x % IVF_K,
            ).alias("probe_cells"),
        )
        .collect()
    }
    assert set(got) == set(want) and len(got) > 100
    for vid, g in got.items():
        w = want[vid]
        assert g["scale"] == w["scale"], vid
        assert g["qv"] == w["qv"], vid
        assert g["cell"] == w["cell"], vid
        expect_probe = w["probe_cells"] if vid == 0 else []
        assert list(g["probe_cells"]) == list(expect_probe), vid


def test_pq_codes_are_4bit(spark):
    """Every PQ code must fit the 4-bit budget the compression story
    claims (0 ≤ code < PQ_CODES in each of the PQ_M subspaces)."""
    from pyspark.sql import functions as F

    from iceberg_by_example_spark.operators.similarity import (
        PQ_CODES,
        PQ_M,
        _pq_code,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    codes = e.select(
        F.array(
            *[_pq_code(F.col("embedding"), m) for m in range(PQ_M)]
        ).alias("codes")
    )
    bad = codes.filter(
        F.exists(
            F.col("codes"), lambda c: (c < 0) | (c >= PQ_CODES)
        )
    ).count()
    assert bad == 0


def test_block_keep_first_semantics(spark, tmp_path):
    """Planted duplicate blocks: the first occurrence (by doc_id, idx)
    survives, later copies drop, unique blocks all survive, and the
    reassembled fingerprint matches a hand-computed md5."""
    import hashlib

    from iceberg_by_example_spark.operators.dedup import (
        BLOCK_TOKENS,
        dedup_block_keep_first,
    )

    blk_a = " ".join(f"a{i}" for i in range(BLOCK_TOKENS))
    blk_b = " ".join(f"b{i}" for i in range(BLOCK_TOKENS))
    blk_c = " ".join(f"c{i}" for i in range(BLOCK_TOKENS))
    corpus = spark.createDataFrame(
        [
            (1, f"{blk_a} {blk_b}"),  # doc 1 owns both firsts
            (2, f"{blk_a} {blk_c}"),  # block A is a repeat here
            (3, blk_b),  # fully duplicated doc → nothing kept
        ],
        "doc_id long, text string",
    )
    sf_dir = str(tmp_path)
    corpus.write.parquet(f"{sf_dir}/documents.parquet")
    rows = {
        r["doc_id"]: r for r in dedup_block_keep_first(spark, sf_dir).collect()
    }
    assert (rows[1]["n_blocks"], rows[1]["n_kept"]) == (2, 2)
    assert (rows[2]["n_blocks"], rows[2]["n_kept"]) == (2, 1)
    assert (rows[3]["n_blocks"], rows[3]["n_kept"]) == (1, 0)
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert rows[1]["kept_fp"] == md5(f"{blk_a} {blk_b}")
    assert rows[2]["kept_fp"] == md5(blk_c)
    assert rows[3]["kept_fp"] == md5("")


def test_dhash_invariant_under_nn_upscale():
    """The provable-duplicate construction: dHash of an exact k×
    nearest-neighbor upscale equals dHash of the base (nested floor
    division), for every corpus group and factor — and distinct base
    patterns produce distinct hashes."""
    from iceberg_by_example_spark.operators.multimodal import (
        PHASH_GROUPS,
        _dhash_hex,
        _phash_base_pixels,
        _phash_pixels,
    )

    base_hashes = []
    for g in range(PHASH_GROUPS):
        base = _dhash_hex(_phash_base_pixels(g))
        base_hashes.append(base)
        for v in range(1, 4):
            assert _dhash_hex(_phash_pixels(g, v)) == base
    assert len(set(base_hashes)) == PHASH_GROUPS


def test_phash_dedup_groups(spark):
    """End-to-end through the real BMP decode: every group collects
    exactly its PHASH_VARIANTS members, none leak across groups."""
    from iceberg_by_example_spark.operators.multimodal import (
        PHASH_GROUPS,
        PHASH_VARIANTS,
        multimodal_phash_dedup,
    )

    rows = multimodal_phash_dedup(spark, "unused").collect()
    assert len(rows) == PHASH_GROUPS
    for r in rows:
        assert r["n_images"] == PHASH_VARIANTS
        groups = {a.split("_")[1] for a in r["assets"].split(",")}
        assert len(groups) == 1


def test_lm_rare_mass_flags_novel_text(spark, tmp_path):
    """A document made of never-seen trigrams scores rare_ratio 1.0;
    a document repeating the dominant corpus phrase scores 0.0."""
    from iceberg_by_example_spark.operators.text import text_lm_rare_mass

    import hashlib

    bucket = lambda i: hashlib.md5(f"lm:{i}".encode()).hexdigest()[:2]
    # the novel doc must sit OUTSIDE the train split, or the model
    # trains on its own trigrams and nothing is OOV
    novel_id = next(i for i in range(1000, 2000) if bucket(i) >= "cd")
    common = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(i, common) for i in range(30)] + [
        (novel_id, "zq xv jk wp mn bt zq xv jk wp"),
    ]
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    sf_dir = str(tmp_path)
    corpus.write.parquet(f"{sf_dir}/documents.parquet")
    rows = {
        r["doc_id"]: r for r in text_lm_rare_mass(spark, sf_dir).collect()
    }
    in_train = [i for i in range(30) if bucket(i) < "cd"]
    assert len(in_train) >= 3, "salted split should not empty the train set"
    novel = rows[novel_id]
    assert novel["n_oov"] == novel["n_tri"]
    assert novel["rare_ratio"] == 1.0
    # the common phrase trains on >= 3 docs => its trigrams are not rare
    for i in in_train:
        assert rows[i]["rare_ratio"] == 0.0


def _nll_micro_ref(cnt3: int, cnt2: int, v: int) -> int:
    """Pure-Python twin of the per-trigram quantized NLL, Spark ROUND
    (HALF_UP) semantics included."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    nll = -math.log((cnt3 + 1) / float(cnt2 + v)) * 1_000_000
    return int(Decimal(nll).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def test_lm_perplexity_math_planted(spark, tmp_path):
    """Independent from-scratch recompute of the add-one-smoothed
    conditional NLL on a planted corpus: train counts, context sums,
    vocabulary, the 1/V unseen-context backstop, and the exact int64
    aggregation must all match a pure-Python model."""
    import hashlib
    import math

    from iceberg_by_example_spark.operators.text import text_lm_perplexity

    bucket = lambda i: hashlib.md5(f"lm:{i}".encode()).hexdigest()[:2]
    novel_id = next(i for i in range(1000, 2000) if bucket(i) >= "cd")
    common = "a b c a b d"
    docs = [(i, common) for i in range(20)] + [(novel_id, "x y z x y")]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r["doc_id"]: (r["n_tri"], r["nll_sum_micro"], r["avg_nll_micro"])
        for r in text_lm_perplexity(spark, str(tmp_path)).collect()
    }

    # pure-Python model
    from collections import Counter

    def tris(text):
        t = text.split(" ")
        return [(" ".join(t[i : i + 2]), t[i + 2]) for i in range(len(t) - 2)]

    train_docs = [txt for i, txt in docs if bucket(i) < "cd"]
    assert train_docs, "split emptied the train set"
    c3 = Counter(g for txt in train_docs for g in tris(txt))
    c2 = Counter()
    for (c, _w), n in c3.items():
        c2[c] += n
    v = len({w for txt in train_docs for _, w in tris(txt)})
    want = {}
    for i, txt in docs:
        if i in want:
            continue
        nlls = [
            _nll_micro_ref(c3.get(g, 0), c2.get(g[0], 0), v)
            for g in tris(txt)
        ]
        want[i] = (len(nlls), sum(nlls), sum(nlls) // len(nlls))
    assert got == want
    # the novel doc's every context is unseen -> uniform 1/V backstop,
    # so its avg NLL is exactly round(ln(V)*1e6) and strictly worse
    # than any train doc's
    assert got[novel_id][2] == _nll_micro_ref(0, 0, v)
    assert got[novel_id][2] == int(round(math.log(v) * 1e6))
    assert got[novel_id][2] > max(
        a for i, (_, _, a) in got.items() if i != novel_id
    )


def test_lm_perplexity_matches_duckdb_twin(spark, sf_dir):
    """_LM_PERPLEXITY_ORACLE (the queued registration oracle) must be
    row-identical on the real corpus — every doc, all three integer
    outputs."""
    import duckdb

    from iceberg_by_example_spark.operators.text import (
        _LM_PERPLEXITY_ORACLE,
        text_lm_perplexity,
    )

    got = {
        r["doc_id"]: (r["n_tri"], r["nll_sum_micro"], r["avg_nll_micro"])
        for r in text_lm_perplexity(spark, sf_dir).collect()
    }
    assert got, "no scored docs"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        d: (int(n), int(s), int(a))
        for d, n, s, a in con.execute(_LM_PERPLEXITY_ORACLE).fetchall()
    }
    assert got == want


def test_cms_overcounts_never_undercounts(spark):
    """Count-min property: every estimate >= the exact count (hash
    collisions only inflate), and with 256 buckets over this tiny
    vocabulary the heavy hitters should estimate exactly."""
    from iceberg_by_example_spark.operators.text import (
        text_heavy_hitters_cms,
    )

    rows = text_heavy_hitters_cms(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["cm_est"] >= r["exact_n"]


def test_phash_hamming_planted_boundary(spark):
    """Each group yields exactly (base,dup,0), (base,near,1),
    (dup,near,1); the 4-flip 'far' variant appears in NO pair — it
    shares no band, so the pigeonhole drops it before popcount."""
    from iceberg_by_example_spark.operators.multimodal import (
        HAM_GROUPS,
        multimodal_phash_hamming,
    )

    rows = multimodal_phash_hamming(spark, "unused").collect()
    got = {(r["asset_a"], r["asset_b"]): r["hamming"] for r in rows}
    assert len(got) == 3 * HAM_GROUPS
    for g in range(HAM_GROUPS):
        base, dup, near = (f"hb_{g}_{s}.bmp" for s in ("base", "dup", "near"))
        assert got[tuple(sorted((base, dup)))] == 0
        assert got[tuple(sorted((base, near)))] == 1
        assert got[tuple(sorted((dup, near)))] == 1
    assert not any("far" in a or "far" in b for a, b in got)


def test_mmr_properties(spark):
    """MMR structure: rank 1 is the pure-relevance argmax (equals
    brute-force top-1) scored on the canonical λ·rel scale (empty
    picked set ⇒ zero penalty, so all ranks share one scale); scores
    are non-increasing from rank 2 on (the max-sim penalty grows
    pointwise as the picked set grows and the candidate pool only
    shrinks); picks are distinct; the run is deterministic."""
    from iceberg_by_example_spark.operators.similarity import (
        MMR_K,
        MMR_LAMBDA,
        sim_mmr_topk,
        sim_topk_cosine,
    )

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        sim_mmr_topk(spark, sf).collect(), key=lambda r: r["rank"]
    )
    assert [r["rank"] for r in rows] == list(range(1, MMR_K + 1))
    assert len({r["vec_id"] for r in rows}) == MMR_K
    brute_top1 = sim_topk_cosine(spark, sf).collect()[0]
    assert rows[0]["vec_id"] == brute_top1["vec_id"]
    assert rows[0]["mmr_score"] == MMR_LAMBDA * brute_top1["cosine"]
    scores = [r["mmr_score"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    rows2 = sorted(
        sim_mmr_topk(spark, sf).collect(), key=lambda r: r["rank"]
    )
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]


def test_pq_encode_batches_matches_expression_forms(spark):
    """The vectorized numpy encoder must emit bit-identical cells and
    codes to the zip_with expression forms (_ivf_key/_pq_code) — the
    reference semantics the oracle is derived from."""
    from pyspark.sql import functions as F

    from iceberg_by_example_spark.operators.similarity import (
        IVF_K,
        PQ_ENCODE_SCHEMA,
        PQ_M,
        _ivf_key,
        _pq_code,
        pq_encode_batches,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    got = {
        r["vec_id"]: (r["cell"], list(r["codes"]))
        for r in e.select("vec_id", "embedding")
        .mapInPandas(pq_encode_batches, PQ_ENCODE_SCHEMA)
        .collect()
    }
    keys = F.array(*[_ivf_key(F.col("embedding"), k) for k in range(IVF_K)])
    want = {
        r["vec_id"]: (r["cell"], list(r["codes"]))
        for r in e.select(
            "vec_id",
            (F.array_min(keys) % IVF_K).alias("cell"),
            F.array(
                *[_pq_code(F.col("embedding"), m) for m in range(PQ_M)]
            ).alias("codes"),
        ).collect()
    }
    assert got == want


def test_exact_substring_semantics(spark, tmp_path):
    """Planted shared run: a 20-token span duplicated into a second
    doc's middle is detected at its exact length (20 = 6 consecutive
    duplicated 15-token window starts → 6 + 14); the first occurrence
    (lowest doc_id, pos) is never marked dup; a doc with no repeats
    reports n_dup = 0, longest_dup_run = 0."""
    from iceberg_by_example_spark.operators.dedup import (
        SUB_TOKENS,
        dedup_exact_substring,
    )

    shared = " ".join(f"s{i}" for i in range(20))
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    uniq_c = " ".join(f"c{i}" for i in range(25))
    corpus = spark.createDataFrame(
        [
            (1, f"{shared} {uniq_a}"),  # owns the first occurrence
            (2, f"{uniq_b} {shared}"),  # repeats it mid-doc
            (3, uniq_c),  # clean
        ],
        "doc_id long, text string",
    )
    corpus.write.parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in dedup_exact_substring(spark, str(tmp_path)).collect()
    }
    # doc 1: 30 tokens → 16 windows, all first occurrences
    assert (rows[1]["n_dup"], rows[1]["longest_dup_run"]) == (0, 0)
    # doc 2: windows fully inside the shared 20-token suffix start at
    # its first 20 - SUB_TOKENS + 1 = 6 positions → run of 6 → 20 tokens
    assert rows[2]["n_dup"] == 20 - SUB_TOKENS + 1
    assert rows[2]["longest_dup_run"] == 20
    assert (rows[3]["n_dup"], rows[3]["longest_dup_run"]) == (0, 0)


def test_bloom_prefilter_sound_and_complete(spark, sf_dir):
    """Bloom soundness: no false negatives ever (every exact dup is a
    candidate — the filter contains all corpus fingerprints by
    construction), and on this corpus/filter sizing (m=2^20, k=3,
    ~450 corpus fps at sf0.001) no false positives either."""
    from iceberg_by_example_spark.operators.dedup import (
        dedup_bloom_prefilter,
    )

    rows = dedup_bloom_prefilter(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["exact_dup"]:
            assert r["bloom_candidate"], f"false negative: {r}"
    fps = [r for r in rows if r["bloom_candidate"] and not r["exact_dup"]]
    assert not fps, f"unexpected Bloom FPs at this sizing: {fps[:3]}"


def test_semdedup_properties(spark, sf_dir):
    """SemDeDup invariants: removals only happen to vectors with a
    same-cell neighbor at cosine >= tau (subset of the exact pair
    graph restricted to same-cell pairs); every such duplicate group
    keeps at least one member (the cell's farthest-from-centroid
    vector is never removed by a tie); and a vector with no same-cell
    pair partner is never removed."""
    from iceberg_by_example_spark.operators.similarity import (
        SEMDEDUP_TAU,
        dedup_embedding_cosine,
        dedup_semdedup,
    )

    rows = dedup_semdedup(spark, sf_dir).collect()
    cell = {r["vec_id"]: r["cell"] for r in rows}
    d2 = {r["vec_id"]: r["d2"] for r in rows}
    removed = {r["vec_id"] for r in rows if r["removed"]}
    pairs = [
        (p["vec_a"], p["vec_b"])
        for p in dedup_embedding_cosine(spark, sf_dir).collect()
        if p["cosine"] >= SEMDEDUP_TAU and cell[p["vec_a"]] == cell[p["vec_b"]]
    ]
    partnered = {v for p in pairs for v in p}
    # removals ⊆ same-cell partnered vectors
    assert removed <= partnered
    # per pair, the (d2 DESC, vec_id ASC)-worse member must be removed
    # (the better one may still be removed by a third neighbor, so only
    # the loser side is asserted); per CELL, the globally best-priority
    # partnered vector can never lose to anyone — it must survive
    for va, vb in pairs:
        lose = min((va, vb), key=lambda v: (d2[v], -v))
        assert lose in removed
    best_per_cell = {}
    for v in partnered:
        c = cell[v]
        if c not in best_per_cell or (d2[v], -v) > (
            d2[best_per_cell[c]],
            -best_per_cell[c],
        ):
            best_per_cell[c] = v
    for v in best_per_cell.values():
        assert v not in removed
    assert pairs, "corpus should contain same-cell duplicate pairs"


def test_recall_report_consistent(spark, sf_dir):
    """The composed report must agree with recomputing overlap from
    the individual method queries, and its bounds must hold
    (hits <= k_returned <= 10, recall = hits/10)."""
    from iceberg_by_example_spark.operators.similarity import (
        sim_ivf_pq_topk,
        sim_ivf_topk,
        sim_lsh_ann_topk,
        sim_recall_report,
        sim_topk_cosine,
    )

    report = {r["method"]: r for r in sim_recall_report(spark, sf_dir).collect()}
    assert set(report) == {"ivf", "ivf_pq", "lsh"}
    brute = {r["vec_id"] for r in sim_topk_cosine(spark, sf_dir).collect()}
    for method, fn in (
        ("ivf", sim_ivf_topk),
        ("ivf_pq", sim_ivf_pq_topk),
        ("lsh", sim_lsh_ann_topk),
    ):
        ids = [r["vec_id"] for r in fn(spark, sf_dir).collect()]
        r = report[method]
        assert r["k_returned"] == len(ids)
        assert r["hits"] == len(set(ids) & brute)
        assert r["hits"] <= r["k_returned"] <= 10
        assert r["recall_at_10"] == r["hits"] / 10


def test_kmeans_refine_lloyd_invariant(spark, sf_dir):
    """Lloyd's step invariant: against the refined integer means,
    every vector's new cell is at least as close as its seed cell
    (argmin), `moved` is exactly cell0 != cell1, and the total
    within-cluster d2 never increases."""
    import math

    from iceberg_by_example_spark.operators.similarity import (
        IVF_K,
        QUANT,
        sim_kmeans_refine,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    rows = sim_kmeans_refine(spark, sf_dir).collect()
    assert rows
    res = {r["vec_id"]: (r["cell0"], r["cell1"], r["moved"]) for r in rows}
    emb = {
        r["vec_id"]: [math.floor(float(x) * QUANT) for x in r["embedding"]]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    # refined means from the seed assignment
    by_cell = {}
    for vid, (c0, _, _) in res.items():
        by_cell.setdefault(c0, []).append(emb[vid])
    means = {
        c: [math.floor(sum(col) / len(vecs)) for col in zip(*vecs)]
        for c, vecs in by_cell.items()
    }
    d2 = lambda v, m: sum((a - b) * (a - b) for a, b in zip(v, m))
    total0 = total1 = 0
    for vid, (c0, c1, moved) in res.items():
        assert moved == (c0 != c1)
        d_new, d_old = d2(emb[vid], means[c1]), d2(emb[vid], means[c0])
        assert d_new <= d_old, (vid, c0, c1)
        # and c1 is the global argmin over all refined means
        best = min((d2(emb[vid], m) * IVF_K + c) for c, m in means.items())
        assert best % IVF_K == c1
        total0 += d_old
        total1 += d_new
    assert total1 <= total0


def test_incremental_ingest_bloom_dedup_lifecycle(spark, tmp_path):
    """Lakehouse + pipeline integration — the daily-ingest dedup loop:
    day-1 docs land in a versioned table and seed a Bloom bitset of
    fingerprints; day-2 lands as a second commit; the INCREMENTAL read
    (only day-2's files) probes the bitset. Every replayed day-1 text
    must flag as a Bloom candidate AND an exact dup; fresh docs pass
    through clean."""
    from pyspark.sql import functions as F

    from iceberg_by_example_spark.operators.dedup import (
        BLOOM_HASHES,
        _bloom_bit,
    )
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    t = VersionedTable.create(
        spark, str(tmp_path / "docs"), schema="doc_id bigint, text string"
    )
    day1 = [(i, f"day one document number {i} body") for i in range(20)]
    dups = [(100 + i, day1[i][1]) for i in range(5)]  # replayed texts
    fresh = [(200 + i, f"day two fresh document {i}") for i in range(7)]
    s1 = t.append(spark.createDataFrame(day1, "doc_id long, text string"))
    t.append(spark.createDataFrame(dups + fresh, "doc_id long, text string"))

    fp = lambda df: df.select(
        "doc_id",
        F.md5(F.regexp_replace(F.trim(F.lower("text")), " +", " ")).alias(
            "fp"
        ),
    )
    corpus = fp(t.read(snapshot_id=s1.snapshot_id)).select("fp").distinct()
    bits = (
        corpus.select(
            F.explode(
                F.array(
                    *[
                        _bloom_bit(F.col("fp"), j)
                        for j in range(1, BLOOM_HASHES + 1)
                    ]
                )
            ).alias("bit")
        )
        .distinct()
        .withColumn("_set", F.lit(1))
    )
    batch = fp(t.read_incremental(from_snapshot_id=s1.snapshot_id))
    assert batch.count() == len(dups) + len(fresh)  # day-2 files only
    bp = batch.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    _bloom_bit(F.col("fp"), j)
                    for j in range(1, BLOOM_HASHES + 1)
                ]
            )
        ).alias("bit"),
    )
    cand = (
        bp.join(F.broadcast(bits), "bit", "left")
        .groupBy("doc_id")
        .agg(F.bool_and(F.col("_set").isNotNull()).alias("candidate"))
    )
    verdicts = {
        r["doc_id"]: (r["candidate"], r["_hit"] is not None)
        for r in batch.join(cand, "doc_id")
        .join(corpus.withColumn("_hit", F.lit(1)), "fp", "left")
        .collect()
    }
    for i in range(5):
        assert verdicts[100 + i] == (True, True), (100 + i, verdicts)
    for i in range(7):
        assert verdicts[200 + i][1] is False
        # Bloom may false-positive in principle; at this sizing it must not
        assert verdicts[200 + i][0] is False
    t.drop()


def _planted_substring_corpus(
    spark, with_below_horizon=False, with_subhorizon_cross=False
):
    """Synthetic corpus for the two-tier contract: globally unique
    filler tokens (no accidental sharing), plus planted CROSS-doc
    shared runs. P1 (35 tokens) into docs 2 and 7, P2 (exactly
    TWO_TIER_HORIZON = 29 tokens) into docs 4 and 9 — all four
    plants at offsets INCONGRUENT mod SPAN_STRIDE (13 vs 27, 6 vs
    43), the alignments the position-strided sampler provably
    misses: the winnowed tier's guarantee must hold regardless.
    Optionally P3 (18 tokens, below SPAN_TOKENS) into docs 11 and
    12 — too short for ANY shared 20-token window, so tier 1
    provably cannot flag it while the unsampled pass (>= 15-token
    detection) still sees it. Optionally P4 (16 tokens, also below
    SPAN_TOKENS) into UNFLAGGED doc 1 and FLAGGED doc 7, doc 1
    holding the keep-first occurrence — the flagged<->unflagged
    sub-horizon edge the composed pass's per-doc stats cannot see."""
    from iceberg_by_example_spark.operators.dedup import TWO_TIER_HORIZON

    p1 = [f"p1x{i:02d}" for i in range(35)]
    p2 = [f"p2x{i:02d}" for i in range(TWO_TIER_HORIZON)]
    p3 = [f"p3x{i:02d}" for i in range(18)]
    p4 = [f"p4x{i:02d}" for i in range(16)]
    rows = []
    n = 12 if with_below_horizon else 10
    for doc in range(1, n + 1):
        toks = [f"d{doc:02d}t{i:02d}" for i in range(60)]
        if doc == 1 and with_subhorizon_cross:
            toks = toks[:9] + p4 + toks[9:]
        elif doc == 2:
            toks = toks[:13] + p1 + toks[13:]
        elif doc == 7:
            toks = toks[:27] + p1 + toks[27:]
            if with_subhorizon_cross:
                # after P1 (spans 27..61) — must not split it
                toks = toks[:80] + p4 + toks[80:]
        elif doc == 4:
            toks = toks[:6] + p2 + toks[6:]
        elif doc == 9:
            toks = toks[:43] + p2 + toks[43:]
        elif doc == 11:
            toks = toks[:3] + p3 + toks[3:]
        elif doc == 12:
            toks = toks[:17] + p3 + toks[17:]
        rows.append((doc, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_two_tier_substring_equals_unsampled_on_flagged(spark):
    """The SCALING.md two-tier contract, executed: on a corpus whose
    duplication is cross-doc shared runs >= TWO_TIER_HORIZON tokens,
    the winnowed tier flags exactly the involved docs (at offsets
    the strided sampler misses), and the composed pass
    equals the full unsampled pass on them — row-exact, including
    longest_dup_run."""
    from iceberg_by_example_spark.operators.dedup import (
        exact_substring_stats,
        span_winnow_pairs,
        two_tier_substring_stats,
    )

    corpus = _planted_substring_corpus(spark)
    flagged = {
        d
        for r in span_winnow_pairs(corpus).collect()
        for d in (r["doc_a"], r["doc_b"])
    }
    assert flagged == {2, 4, 7, 9}

    full = {r["doc_id"]: r for r in exact_substring_stats(corpus).collect()}
    # keep-first: the lower doc_id holds the kept first occurrences
    assert {d for d, r in full.items() if r["n_dup"] > 0} == {7, 9}
    # every doc the full pass finds duplication in IS flagged
    assert {d for d, r in full.items() if r["n_dup"] > 0} <= flagged
    # P1 is 35 tokens: 21 consecutive dup window starts -> run of 35
    assert full[7]["longest_dup_run"] == 35

    composed = {
        r["doc_id"]: r
        for r in two_tier_substring_stats(corpus).collect()
    }
    assert set(composed) == flagged
    for d in flagged:
        for c in ("n_windows", "n_dup", "longest_dup_run"):
            assert composed[d][c] == full[d][c], (d, c)


def test_two_tier_substring_below_horizon_caveat(spark):
    """The documented trade: an 18-token shared run (below
    SPAN_TOKENS — no shared 20-token window can exist) is found by
    the full unsampled pass but is provably invisible to tier 1 —
    the composed pass misses it. This is the floor of the sampled
    tier; TWO_TIER_HORIZON is where detection becomes guaranteed."""
    from iceberg_by_example_spark.operators.dedup import (
        exact_substring_stats,
        two_tier_substring_stats,
    )

    corpus = _planted_substring_corpus(spark, with_below_horizon=True)
    full = {r["doc_id"]: r for r in exact_substring_stats(corpus).collect()}
    assert full[12]["n_dup"] > 0  # the unsampled pass sees the 18-token run
    composed = {
        r["doc_id"]: r
        for r in two_tier_substring_stats(corpus).collect()
    }
    assert 12 not in composed  # ...the sampled tier cannot flag it
    # the above-horizon docs are still flagged and row-exact
    for d in (7, 9):
        for c in ("n_windows", "n_dup", "longest_dup_run"):
            assert composed[d][c] == full[d][c], (d, c)


def test_two_tier_flagged_unflagged_subhorizon_edge(spark):
    """ADVICE r9 #3 pinned: a 16-token run (>= SUB_TOKENS, <
    SPAN_TOKENS) shared between FLAGGED doc 7 and UNFLAGGED doc 1 —
    with doc 1 holding the keep-first occurrence — is counted by the
    full unsampled pass as dup windows IN THE FLAGGED DOC, yet is
    invisible to the composed pass: doc 1's windows never enter tier
    2's firsts relation, so doc 7's copies become firsts themselves.
    Flagged-doc stats are exact relative to the FLAGGED SUBSET, not
    the corpus, whenever sub-horizon cross-doc runs touch unflagged
    docs (the documented trade in two_tier_substring_stats)."""
    from iceberg_by_example_spark.operators.dedup import (
        SUB_TOKENS,
        exact_substring_stats,
        span_winnow_pairs,
        two_tier_substring_stats,
    )

    corpus = _planted_substring_corpus(spark, with_subhorizon_cross=True)
    flagged = {
        d
        for r in span_winnow_pairs(corpus).collect()
        for d in (r["doc_a"], r["doc_b"])
    }
    assert 1 not in flagged  # 16 shared tokens: no shared 20-window
    assert 7 in flagged  # still flagged via P1

    full = {r["doc_id"]: r for r in exact_substring_stats(corpus).collect()}
    composed = {
        r["doc_id"]: r for r in two_tier_substring_stats(corpus).collect()
    }
    assert 1 not in composed
    # the full pass charges doc 7 the P4 windows (first is in doc 1);
    # the composed pass cannot — exactly the 16-15+1 = 2 windows
    assert full[7]["n_dup"] - composed[7]["n_dup"] == 16 - SUB_TOKENS + 1
    # every OTHER flagged doc is still row-exact vs the full pass
    for d in flagged - {7}:
        for c in ("n_windows", "n_dup", "longest_dup_run"):
            assert composed[d][c] == full[d][c], (d, c)


def test_keep_first_skew_fallback_fires_and_matches(spark):
    """r9 VERDICT task #7: the window-MIN keep-first's skew fallback
    is code, not prose. On a planted corpus where one block hash is
    pathologically hot (one boilerplate block in every doc), the
    measured dispatch (strategy=None with a small gate) must (a)
    choose the groupBy-min + join-back plan — no Window operator in
    the physical plan, the map-side-combinable aggregate instead —
    and (b) produce row-identical keep-first winners to the window
    form; on a benign corpus the same dispatch stays on the window
    plan."""
    from iceberg_by_example_spark.operators.dedup import (
        keep_first_min_struct,
    )

    # 200 docs, each containing the SAME block hash ("hot hot hot")
    # plus a unique one — the hot key has 200 instances, every other
    # key has 1
    rows = []
    for doc in range(200):
        rows += [(doc, 0, "hot"), (doc, 1, f"unique{doc}")]
    inst = spark.createDataFrame(
        rows, "doc_id long, idx long, block string"
    ).select("doc_id", "idx", F.md5("block").alias("h"))

    def winners(df):
        return {
            (r["doc_id"], r["idx"], r["h"]): (
                r["_first"]["doc_id"],
                r["_first"]["idx"],
            )
            for r in df.collect()
        }

    win_form = keep_first_min_struct(
        inst, ["h"], ["doc_id", "idx"], strategy="window"
    )
    adaptive = keep_first_min_struct(
        inst, ["h"], ["doc_id", "idx"], strategy=None, hot_max=50
    )
    # (a) the fallback plan fired: no Window operator, a join instead
    adaptive_plan = adaptive._jdf.queryExecution().executedPlan().toString()
    win_plan = win_form._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in adaptive_plan
    assert "Window" in win_plan
    # (b) identical winners, every row
    assert winners(adaptive) == winners(win_form)
    # the hot key's winner is the global struct-min (doc 0, idx 0)
    hot_h = inst.filter("idx = 0").select("h").first()["h"]
    assert winners(adaptive)[(5, 0, hot_h)] == (0, 0)
    # benign corpus (gate not exceeded): dispatch keeps the window plan
    benign = keep_first_min_struct(
        inst, ["h"], ["doc_id", "idx"], strategy=None, hot_max=10_000
    )
    assert "Window" in benign._jdf.queryExecution().executedPlan().toString()

    # r10 "What's wrong" #2: a supplied census replaces the extra
    # measurement pass. Same hot corpus + the real census → fallback
    # fires and winners are identical to the window form...
    census = inst.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    with_census = keep_first_min_struct(
        inst, ["h"], ["doc_id", "idx"], strategy=None, hot_max=50,
        census=census,
    )
    assert "Window" not in (
        with_census._jdf.queryExecution().executedPlan().toString()
    )
    assert winners(with_census) == winners(win_form)
    # ...and the dispatch demonstrably READS the census, not inst: a
    # planted census claiming max multiplicity 1 keeps the window plan
    # even though inst itself is hot.
    fake = census.select("h", F.lit(1).alias("df"))
    trusting = keep_first_min_struct(
        inst, ["h"], ["doc_id", "idx"], strategy=None, hot_max=50,
        census=fake,
    )
    assert "Window" in (
        trusting._jdf.queryExecution().executedPlan().toString()
    )


def test_bm25_term_128bit_overflow_headroom(spark):
    """r9 ADVICE #1 pinned: the BM25 fixed-point numerator
    BM25_SCALE*22*D*tf crosses int64 at D*tf ~ 4e11, reachable on any
    production corpus. The term now evaluates in 128-bit integers
    (DECIMAL(38,0) div in Spark, HUGEINT // in DuckDB) — this test
    feeds planted trillion-doc / 400T-token stats through BOTH
    engines' term expressions and requires bit-identical results
    where the old int64 form would have overflowed (ANSI error)."""
    import duckdb

    from iceberg_by_example_spark.operators.text import (
        _BM25_TERM_SPARK,
        _BM25_TERM_SQL,
    )

    rows = [
        # (n_docs, df, d_tokens, tf, dl): sf0.01-like, then two
        # production regimes past the old int64 numerator bound
        (4500, 120, 480000, 3, 250),
        (10**12, 5 * 10**11, 4 * 10**14, 10**4, 10**6),
        (10**11, 7, 10**14, 2, 31),
    ]
    df = spark.createDataFrame(
        rows, "n_docs long, df long, d_tokens long, tf long, dl long"
    )
    got = [
        r[0]
        for r in df.select(F.expr(_BM25_TERM_SPARK).cast("string")).collect()
    ]
    con = duckdb.connect()
    want = []
    for r in rows:
        con.execute(
            "CREATE OR REPLACE TABLE t AS SELECT ? AS n_docs, ? AS df,"
            " ? AS d_tokens, ? AS tf, ? AS dl",
            list(r),
        )
        want.append(
            str(con.execute(f"SELECT {_BM25_TERM_SQL} FROM t").fetchone()[0])
        )
    assert got == want


def test_bm25_fixed_point_matches_float_okapi(spark):
    """The integer BM25 is exact fixed-point Okapi: recompute float
    BM25 (k1=1.2, b=0.75, idf = N - df) from the raw parquet with an
    independent pandas tokenization and require (a) every doc's
    integer score to sit within the per-term floor-quantization bound
    of BM25_SCALE * float score, and (b) the full induced ranking to
    agree."""
    import collections

    import pandas as pd

    from iceberg_by_example_spark.operators.text import (
        BM25_QUERY,
        BM25_SCALE,
        bm25_scored,
    )

    sf = "/root/testdata/sf0.001"
    pdf = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    toks = {
        r.doc_id: [t for t in r.text.split(" ") if t]
        for r in pdf.itertuples()
    }
    n_docs = len(toks)
    d_tokens = sum(len(t) for t in toks.values())
    avgdl = d_tokens / n_docs
    tf = {
        d: collections.Counter(t)
        for d, t in toks.items()
    }
    df = {
        q: sum(1 for d in tf if tf[d][q] > 0)
        for q in BM25_QUERY
    }
    want = {}
    for d, counts in tf.items():
        s = 0.0
        n_terms = 0
        for q in BM25_QUERY:
            if counts[q] == 0:
                continue
            n_terms += 1
            sat = (2.2 * counts[q]) / (
                counts[q] + 0.3 + 0.9 * len(toks[d]) / avgdl
            )
            s += (n_docs - df[q]) * sat
        if n_terms:
            want[d] = s

    got = {
        r["doc_id"]: r["bm25"] for r in bm25_scored(spark, sf).collect()
    }
    assert set(got) == set(want)
    # floor quantization loses < 1 fixed-point unit per term, scaled
    # by the term's (N - df) idf weight
    bound = len(BM25_QUERY) * n_docs + 1
    for d, s in want.items():
        assert abs(got[d] - s * BM25_SCALE) <= bound, (d, got[d], s)
    rank = lambda scores: sorted(scores, key=lambda d: (-scores[d], d))
    assert rank(got) == rank(want)


def test_rrf_fusion_consistency(spark):
    """RRF internal consistency at sf0.001: the reported ranks must
    reproduce each ranker's own ordering (lex_rank 1 = the BM25
    argmax), and the fused score must equal the integer-division
    formula applied to the reported ranks, with absent rankers
    contributing exactly zero."""
    from iceberg_by_example_spark.operators.similarity import (
        RRF_K0,
        RRF_SCALE,
    )
    from iceberg_by_example_spark.operators.text import bm25_scored
    from iceberg_by_example_spark.plans.registry import QUERY_REGISTRY, _load_all

    _load_all()
    sf = "/root/testdata/sf0.001"
    rows = QUERY_REGISTRY["sim_hybrid_rrf_topk"].fn(spark, sf).collect()
    assert rows and len(rows) <= 10
    for r in rows:
        expect = 0
        if r["lex_rank"] > 0:
            expect += RRF_SCALE // (RRF_K0 + r["lex_rank"])
        if r["dense_rank"] > 0:
            expect += RRF_SCALE // (RRF_K0 + r["dense_rank"])
        assert r["rrf"] == expect, r
    # fused output is sorted by (rrf desc, doc_id)
    key = [(-r["rrf"], r["doc_id"]) for r in rows]
    assert key == sorted(key)
    # the doc holding lex_rank 1 is the true BM25 argmax
    lex1 = [r["doc_id"] for r in rows if r["lex_rank"] == 1]
    bm = {r["doc_id"]: r["bm25"] for r in bm25_scored(spark, sf).collect()}
    argmax = min(bm, key=lambda d: (-bm[d], d))
    if lex1:
        assert lex1 == [argmax]


# ---------------------------------------------------------------------------
# BPE tokenizer training (operators/tokenizer.py)
# ---------------------------------------------------------------------------

BPE_CORPUS = [
    (1, "the cat sat on the mat and the cat was happy"),
    (2, "the dog sat on the log and the dog was happy"),
    (3, "lower lowest newer newest wider widest low new"),
    (4, "the catalog catalogs the cataloger cataloging catalogued"),
    (5, "Zyzzyva quokka axolotl the cat and the dog sat"),
]


def _ref_word_counts(texts):
    """Independent word-frequency reference: regex over lowered text."""
    import re
    from collections import Counter

    c = Counter()
    for t in texts:
        c.update(re.findall("[a-z]+", t.lower()))
    return c


def _ref_bpe_train(word_freqs, n_merges):
    """From-scratch reference trainer (Sennrich): structured differently
    from the implementation on purpose — Counter-based pair stats and
    regex-free tuple rewriting — but must produce the identical merge
    list under the same (count DESC, pair ASC) tie-break and the
    best-count>=2 stopping rule."""
    from collections import Counter

    vocab = Counter()
    for w, f in word_freqs:
        vocab[tuple(w) + ("</w>",)] += f
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                stats[(sym[i], sym[i + 1])] += f
        if not stats:
            break
        best_count = max(stats.values())
        if best_count < 2:
            break
        best = min(p for p, c in stats.items() if c == best_count)
        merges.append(best)
        nv = Counter()
        for sym, f in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nv[tuple(out)] += f
        vocab = nv
    return merges


def _ref_bpe_encode(word, merges):
    """Reference greedy encoder: applies merges strictly in learned
    order, one full left-to-right sweep per merge."""
    sym = list(word) + ["</w>"]
    for a, b in merges:
        out = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


@pytest.fixture()
def bpe_docs(spark):
    return spark.createDataFrame(BPE_CORPUS, "doc_id long, text string")


def test_bpe_trainer_matches_reference(bpe_docs):
    from iceberg_by_example_spark.operators.tokenizer import (
        bpe_learn_from_corpus,
    )

    merges, head = bpe_learn_from_corpus(bpe_docs, n_merges=40, vocab_cap=1000)
    ref_counts = _ref_word_counts([t for _, t in BPE_CORPUS])
    # corpus pass must reproduce the exact frequency table
    assert dict(head) == dict(ref_counts)
    ref_head = sorted(ref_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    assert merges == _ref_bpe_train(ref_head, 40)
    assert merges  # fixture has learnable structure


def test_bpe_encoder_agrees_with_reference_sweep_order():
    """Greedy lowest-rank-first encode == in-order full sweeps: both
    are the standard BPE application; on any learned merge list they
    coincide because earlier merges' outputs are later merges' inputs.
    Checked exhaustively over the trained fixture vocabulary."""
    from iceberg_by_example_spark.operators.tokenizer import (
        bpe_encode,
        bpe_train,
    )

    ref_counts = _ref_word_counts([t for _, t in BPE_CORPUS])
    head = sorted(ref_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    merges = bpe_train(head, 30)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in list(ref_counts) + ["unseenword", "q", "zzzz"]:
        assert bpe_encode(w, ranks) == _ref_bpe_encode(w, merges), w


def test_bpe_tokenize_stats_exact_with_oov_tail(bpe_docs):
    """End-to-end per-doc accounting vs the reference, with vocab_cap
    small enough that BOTH the broadcast head path and the pandas-UDF
    OOV tail are exercised."""
    import re

    from iceberg_by_example_spark.operators.tokenizer import (
        bpe_tokenize_stats,
    )

    cap = 8
    rows = {
        r["doc_id"]: r
        for r in bpe_tokenize_stats(bpe_docs, n_merges=25, vocab_cap=cap).collect()
    }

    ref_counts = _ref_word_counts([t for _, t in BPE_CORPUS])
    ranked = sorted(ref_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    head = ranked[:cap]
    merges = _ref_bpe_train(head, 25)
    vocab = {w for w, _ in head}

    saw_oov = saw_inv = False
    for doc_id, text in BPE_CORPUS:
        words = re.findall("[a-z]+", text.lower())
        n_pieces = sum(len(_ref_bpe_encode(w, merges)) for w in words)
        oov_words = [w for w in words if w not in vocab]
        saw_oov |= bool(oov_words)
        saw_inv |= len(oov_words) < len(words)
        r = rows[doc_id]
        assert r["n_words"] == len(words)
        assert r["n_pieces"] == n_pieces
        assert r["n_oov_words"] == len(oov_words)
        assert r["n_oov_pieces"] == sum(
            len(_ref_bpe_encode(w, merges)) for w in oov_words
        )
    assert saw_oov and saw_inv  # fixture must exercise both paths


def test_bpe_zero_merges_counts_chars_plus_end(bpe_docs):
    import re

    from iceberg_by_example_spark.operators.tokenizer import (
        bpe_tokenize_stats,
    )

    rows = {
        r["doc_id"]: r["n_pieces"]
        for r in bpe_tokenize_stats(bpe_docs, n_merges=0, vocab_cap=1000).collect()
    }
    for doc_id, text in BPE_CORPUS:
        words = re.findall("[a-z]+", text.lower())
        assert rows[doc_id] == sum(len(w) + 1 for w in words)


def test_bpe_word_counts_plan_is_bounded_topk(bpe_docs):
    """The vocab cap must be TakeOrderedAndProject (bounded top-k),
    never a global sort of the vocabulary."""
    from iceberg_by_example_spark.operators.tokenizer import bpe_word_counts

    plan = bpe_word_counts(bpe_docs, vocab_cap=16)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# Incremental winnow (batch-vs-corpus span dedup)
# ---------------------------------------------------------------------------


def test_incremental_winnow_probe_semantics(spark):
    """On the planted corpus (P1 shared by docs 2/7, P2 by 4/9, both at
    strided-sampler-hostile alignments): a batch containing one side of
    each plant reports exactly the batch->corpus pairs; putting BOTH
    sides of a plant in the batch (or leaving both in the corpus)
    reports nothing — batch<->batch and corpus<->corpus pairs are
    structurally never formed. The result must also equal the full
    ``span_winnow_pairs`` set restricted to cross-slice pairs (the
    census here is corpus-side-only, but every planted key has
    corpus-df 1, far under the cap, so the two bounds coincide)."""
    from iceberg_by_example_spark.operators.dedup import (
        incremental_winnow_pairs,
        span_winnow_pairs,
        winnow_keys,
    )

    docs = _planted_substring_corpus(spark)
    keys = winnow_keys(docs)
    batch_ids = {7, 9, 5}

    out = {
        (r["batch_doc"], r["corpus_doc"]): r["shared_keys"]
        for r in incremental_winnow_pairs(
            keys.filter(F.col("doc_id").isin(*batch_ids)),
            keys.filter(~F.col("doc_id").isin(*batch_ids)),
        ).collect()
    }
    assert set(out) == {(7, 2), (9, 4)}
    assert all(v >= 1 for v in out.values())

    full_cross = {}
    for r in span_winnow_pairs(docs).collect():
        a, b = r["doc_a"], r["doc_b"]
        if (a in batch_ids) != (b in batch_ids):
            key = (a, b) if a in batch_ids else (b, a)
            full_cross[key] = r["shared_keys"]
    assert out == full_cross

    # both sides of P1 in the batch: batch<->batch excluded, and the
    # corpus-side plant (4/9) is corpus<->corpus — nothing to report
    assert (
        incremental_winnow_pairs(
            keys.filter(F.col("doc_id").isin(2, 7)),
            keys.filter(~F.col("doc_id").isin(2, 7)),
        ).count()
        == 0
    )


def _scan_to_join_paths(plan: str, scan_marker: str) -> list[list[str]]:
    """For every plan line containing ``scan_marker``, the chain of
    ancestor lines from the scan UP TO (exclusive) the nearest join
    node, using the tree-drawing prefix depth (every ':- ' / '+- ' /
    ':  ' / '   ' segment is 3 chars). An exchange-free scan→join path
    is exactly 'this join needs no exchange on that side'."""

    def depth(line: str) -> int:
        i = 0
        while line[i : i + 3] in (":- ", "+- ", ":  ", "   "):
            i += 3
        return i // 3

    lines = plan.splitlines()
    paths = []
    for n, line in enumerate(lines):
        if scan_marker not in line:
            continue
        path = []
        d = depth(line)
        for prior in reversed(lines[:n]):
            pd = depth(prior)
            if pd < d:
                d = pd
                if "Join" in prior:
                    break
                path.append(prior)
        paths.append(path)
    return paths


def test_incremental_winnow_bucketed_index_exchange_free(spark):
    """r10 VERDICT task #5: the docstring's 'bucketed on k at write
    time the probe join needs no corpus-side exchange' is a plan
    property, not prose. Materialize the corpus winnow index as a
    k-bucketed table, run incremental_winnow_pairs against it with
    broadcast off (so the probe join actually exercises the bucketed
    path), and assert (a) the index scans read Bucketed: true, (b) the
    path from each index scan up to its join has NO Exchange — the
    census agg and the probe join's corpus side both run bucket-local;
    only the O(batch) side and the final pairs agg shuffle — and (c)
    results are identical to the unbucketed path."""
    from iceberg_by_example_spark.operators.dedup import (
        incremental_winnow_pairs,
        winnow_index_table,
        winnow_keys,
    )

    docs = _planted_substring_corpus(spark)
    keys = winnow_keys(docs)
    batch_ids = {7, 9, 5}
    batch = keys.filter(F.col("doc_id").isin(*batch_ids))
    corpus = keys.filter(~F.col("doc_id").isin(*batch_ids))

    idx = winnow_index_table(spark, corpus, name="widx_test")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = incremental_winnow_pairs(batch, idx)
        # read the plan BEFORE executing (post-collect AQE bookkeeping
        # double-counts exchanges)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Bucketed: true") == 2  # census + probe scans
        paths = _scan_to_join_paths(plan, "widx_test")
        assert len(paths) == 2
        for path in paths:
            assert not any("Exchange" in line for line in path), (
                "corpus-side exchange over the bucketed index:\n"
                + "\n".join(path)
            )
        got = {
            (r["batch_doc"], r["corpus_doc"]): r["shared_keys"]
            for r in pairs.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    want = {
        (r["batch_doc"], r["corpus_doc"]): r["shared_keys"]
        for r in incremental_winnow_pairs(batch, corpus).collect()
    }
    assert got == want == {(7, 2): got[(7, 2)], (9, 4): got[(9, 4)]}


def test_winnow_index_table_refresh_and_schema_guard(spark):
    """r11 ADVICE #1 + r12 ADVICE #2: the pay-once index is
    SINGLE-CORPUS per (pid, name) — a second caller that swapped
    corpora must say refresh=True (drop + rewrite honoring the new
    corpus_keys) or pick a new name. The reuse guard catches BOTH
    failure modes without re-reading the corpus: schema drift, and —
    via the canonicalized plan signature stored as a table property —
    a same-schema different-derivation corpus (the common swap).
    Re-deriving the SAME corpus reuses the standing index free."""
    from iceberg_by_example_spark.operators.dedup import (
        winnow_index_table,
        winnow_keys,
    )

    keys = winnow_keys(_planted_substring_corpus(spark))
    a = keys.filter(F.col("doc_id") < 5)
    b = keys.filter(F.col("doc_id") >= 5)

    def rows(df):
        return {(r["doc_id"], r["k"]) for r in df.collect()}

    idx_a = winnow_index_table(spark, a, name="widx_adv1")
    rows_a = rows(idx_a)
    assert rows_a == rows(a)
    # same corpus re-derived through the same lineage: the standing
    # index comes back (corpus_keys deliberately unread)
    a2 = keys.filter(F.col("doc_id") < 5)
    assert rows(winnow_index_table(spark, a2, name="widx_adv1")) == rows_a
    # same schema, DIFFERENT corpus derivation: the plan-signature
    # guard raises instead of silently serving corpus a
    with pytest.raises(ValueError, match="plan signature"):
        winnow_index_table(spark, b, name="widx_adv1")
    # refresh=True rebuilds for the new corpus
    assert rows(
        winnow_index_table(spark, b, name="widx_adv1", refresh=True)
    ) == rows(b)
    # schema drift on the reuse path raises, never returns stale rows
    with pytest.raises(ValueError, match="refresh=True"):
        winnow_index_table(
            spark, b.withColumnRenamed("doc_id", "docid"), name="widx_adv1"
        )


def test_keep_first_census_count_col_guard(spark):
    """r11 ADVICE #4: the measured dispatch must not read the hot-key
    multiplicity from whatever column happens to lead a caller's
    census — a leading non-integral column raises, and an explicit
    census_count_col drives the dispatch off the named column."""
    from iceberg_by_example_spark.operators.dedup import (
        keep_first_min_struct,
    )

    inst = spark.createDataFrame(
        [(0, 0, "x"), (1, 0, "x"), (2, 0, "y")],
        "doc_id long, idx long, block string",
    ).select("doc_id", "idx", F.md5("block").alias("h"))
    # census whose FIRST non-key column is a ratio (the footgun)
    census = inst.groupBy("h").agg(
        (F.count(F.lit(1)) / 3.0).alias("share"),
        F.count(F.lit(1)).alias("df"),
    )
    with pytest.raises(TypeError, match="integral"):
        keep_first_min_struct(
            inst, ["h"], ["doc_id", "idx"], strategy=None, census=census
        )
    # naming the count column restores the dispatch: df("x")=2 > 1
    # fires the combined fallback (no Window operator)
    named = keep_first_min_struct(
        inst,
        ["h"],
        ["doc_id", "idx"],
        strategy=None,
        hot_max=1,
        census=census,
        census_count_col="df",
    )
    plan = named._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert {
        (r["doc_id"], r["_first"]["doc_id"]) for r in named.collect()
    } == {(0, 0), (1, 0), (2, 2)}


def test_corpus_pins_released_after_materialization(spark, sf_dir):
    """r11 ADVICE #2/#3: the operators that persist a corpus-sized
    intermediate for double consumption (incremental winnow's key
    relation, quality CDF's quantized projection) must release that
    pin once the result is materialized — library callers must not
    accumulate corpus-sized cached blocks per invocation. Only the
    detached (localCheckpoint) RESULT may stay pinned, per the
    repo-wide detach contract."""
    from iceberg_by_example_spark.operators.dedup import (
        dedup_incremental_winnow,
    )
    from iceberg_by_example_spark.operators.text import text_quality_cdf

    jsc = spark.sparkContext._jsc
    for fn in (dedup_incremental_winnow, text_quality_cdf):
        # track ADDED pin ids, not a size delta: the ContextCleaner
        # may asynchronously drop an older test's garbage-collected
        # localCheckpoint block mid-call, and a size delta would
        # misread that removal as this operator releasing its input
        before = set(jsc.getPersistentRDDs().keySet().toArray())
        fn(spark, sf_dir).collect()
        added = (
            set(jsc.getPersistentRDDs().keySet().toArray()) - before
        )
        assert len(added) == 1, (
            f"{fn.__name__} left {sorted(added)} pinned RDDs (want 1: "
            "the detached result only — the input persist must be "
            "released)"
        )


# ---------------------------------------------------------------------------
# DSIR Gumbel top-k resample
# ---------------------------------------------------------------------------


def _gumbel_key_ref(doc_id: int, dsir_weight: int) -> int:
    """Pure-Python twin of dsir_gumbel_topk's key, Spark ROUND
    (HALF_UP) semantics included."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    h = int(hashlib.md5(f"gumbel:{doc_id}".encode()).hexdigest()[:15], 16)
    # mirror the engine clamp (r10 ADVICE #1): u strictly below 1.0 so
    # -ln(-ln(u)) is always finite
    u = min((h + 0.5) / float(1 << 60), 1.0 - 2.0**-53)
    g = 1_000_000 * -math.log(-math.log(u))
    return dsir_weight + int(
        Decimal(repr(g)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def test_dsir_gumbel_topk_matches_reference(spark, sf_dir):
    """The selected set (and every key) must equal a from-scratch
    Python recomputation over the collected weights — the whole
    noise-injection path is deterministic — and must be invariant to
    the input's partitioning (TakeOrderedAndProject's merge is
    order-free given the injective tie-break)."""
    from iceberg_by_example_spark.operators.sampling import (
        dsir_gumbel_topk,
        pipeline_dsir_weights,
    )

    w = pipeline_dsir_weights(spark, sf_dir)
    got = [
        (r["gumbel_key"], r["doc_id"])
        for r in dsir_gumbel_topk(w, k=25).collect()
    ]
    ref = sorted(
        (
            (_gumbel_key_ref(r["doc_id"], r["dsir_weight"]), r["doc_id"])
            for r in w.collect()
        ),
        key=lambda t: (-t[0], t[1]),
    )[:25]
    assert got == ref

    reparted = [
        (r["gumbel_key"], r["doc_id"])
        for r in dsir_gumbel_topk(w.repartition(13), k=25).collect()
    ]
    assert reparted == ref


def test_dsir_gumbel_topk_weight_dominance(spark):
    """Gumbel noise is bounded on a finite corpus: a doc whose
    log-weight exceeds every other by more than the observed noise
    spread is always selected — the importance weights, not the noise,
    carry the decision."""
    from iceberg_by_example_spark.operators.sampling import dsir_gumbel_topk

    rows = [(i, 0) for i in range(1, 50)] + [(99, 50_000_000)]
    w = spark.createDataFrame(rows, "doc_id long, dsir_weight long")
    top = dsir_gumbel_topk(w, k=1).collect()
    assert [r["doc_id"] for r in top] == [99]


# ---------------------------------------------------------------------------
# Temperature-scaled mixture
# ---------------------------------------------------------------------------


def test_temperature_mix_properties(spark):
    from iceberg_by_example_spark.operators.sampling import (
        MIX_POW_SCALE,
        temperature_mix_rates,
    )

    per_source = spark.createDataFrame(
        [("big", 1_000_000), ("s1", 1_000), ("s2", 1_000)],
        "source string, source_tokens long",
    )
    rows = {r["source"]: r for r in temperature_mix_rates(per_source).collect()}

    # shares are a distribution; equal sources get identical shares
    assert abs(sum(r["temp_share"] for r in rows.values()) - 1.0) < 1e-12
    assert rows["s1"]["temp_share"] == rows["s2"]["temp_share"]
    # alpha < 1: small domains boosted, the big one damped — but the
    # ORDER of shares still follows size
    assert rows["s1"]["boost"] > 1.0 > rows["big"]["boost"]
    assert rows["big"]["temp_share"] > rows["s1"]["temp_share"]

    # exact fixed-point twin: pow_q = ROUND(1e6 * n^alpha)
    import math

    pow_q = {
        s: round(MIX_POW_SCALE * math.exp(0.3 * math.log(n)))
        for s, n in (("big", 1_000_000), ("s1", 1_000), ("s2", 1_000))
    }
    tot = sum(pow_q.values())
    for s in rows:
        assert abs(rows[s]["temp_share"] - pow_q[s] / tot) < 1e-12

    # alpha = 1 reproduces the natural mix (within quantization)
    nat = {
        r["source"]: r
        for r in temperature_mix_rates(per_source, alpha=1.0).collect()
    }
    for s in nat:
        assert abs(nat[s]["temp_share"] - nat[s]["natural_share"]) < 1e-9


# ---------------------------------------------------------------------------
# Cross-source KMV overlap sketches
# ---------------------------------------------------------------------------


def test_source_kmv_sketch_is_true_bottom_k(spark, sf_dir):
    """The threshold prefilter is a pure optimization: the filtered
    bottom-k must equal the bottom-k of the UNFILTERED distinct
    shingle-hash relation for every source (the Chernoff margin makes
    a miss astronomically unlikely; this pins it on the real corpus)."""
    from iceberg_by_example_spark.operators.dedup import (
        KMV_K,
        _md5_hash60,
        _shingle_sets,
        source_kmv_sketches,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = {}
    for r in source_kmv_sketches(docs).collect():
        got.setdefault(r["source"], []).append(r["h"])
    full = {}
    rows = (
        _shingle_sets(docs, drop_short=True, carry=("source",))
        .select("source", F.explode("sh").alias("s"))
        .select("source", _md5_hash60(F.col("s")).alias("h"))
        .distinct()
        .collect()
    )
    for r in rows:
        full.setdefault(r["source"], []).append(r["h"])
    assert set(got) == set(full)
    for s in full:
        assert sorted(got[s]) == sorted(full[s])[:KMV_K], s


def test_source_overlap_matches_duckdb_twin_and_exact_jaccard(
    spark, sf_dir
):
    """Two independent checks on the pairwise estimates: (a) the
    DuckDB twin (_SOURCE_OVERLAP_ORACLE — the future registration
    oracle) produces the IDENTICAL rows, integer-for-integer; (b) each
    estimate is within the KMV error envelope of the exact shingle
    Jaccard (std-err 1/sqrt(k); 4 sigma bound)."""
    import math

    import duckdb

    from iceberg_by_example_spark.operators.dedup import (
        KMV_K,
        _SOURCE_OVERLAP_ORACLE,
        dedup_source_overlap,
    )

    got = {
        (r["source_a"], r["source_b"]): (
            r["k_used"],
            r["inter_k"],
            r["jaccard_est"],
        )
        for r in dedup_source_overlap(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        (sa, sb): (k, i, j)
        for sa, sb, k, i, j in con.execute(
            _SOURCE_OVERLAP_ORACLE
        ).fetchall()
    }
    assert got == want
    exact = {
        (sa, sb): j
        for sa, sb, j in con.execute("""
            WITH toks AS (
              SELECT source, STRING_SPLIT(text, ' ') AS t FROM documents
              WHERE LEN(STRING_SPLIT(text, ' ')) >= 3),
            sh AS (
              SELECT DISTINCT source, s FROM toks,
              LATERAL (SELECT UNNEST(
                [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                 for i in generate_series(1, LEN(t) - 2)]) AS s)),
            n AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
            inter AS (
              SELECT a.source AS sa, b.source AS sb, COUNT(*) AS i
              FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
              GROUP BY 1, 2)
            SELECT inter.sa, inter.sb,
                   CAST(i AS DOUBLE) / (na.n + nb.n - i)
            FROM inter JOIN n na ON na.source = inter.sa
                       JOIN n nb ON nb.source = inter.sb
        """).fetchall()
    }
    bound = 4.0 / math.sqrt(KMV_K)
    for pair, (_, _, est) in got.items():
        assert abs(est - exact.get(pair, 0.0)) <= bound, (
            pair,
            est,
            exact.get(pair),
        )


# ---------------------------------------------------------------------------
# Deterministic global corpus shuffle
# ---------------------------------------------------------------------------


def test_global_shuffle_is_exact_keyed_order_and_balanced(spark, sf_dir):
    """(shard, pos) lexicographic must equal the brute-force global
    order by (key, doc_id) EXACTLY (the power-of-two range split is a
    prefix split of the key, so shard boundaries never reorder), the
    assignment must be invariant to input partitioning, the DuckDB
    twin must produce identical rows, and shards must be usably
    balanced (hash-uniform keys)."""
    import hashlib

    import duckdb

    from iceberg_by_example_spark.operators.sampling import (
        _GLOBAL_SHUFFLE_ORACLE,
        SHUFFLE_SHARDS,
        pipeline_global_shuffle,
    )

    rows = pipeline_global_shuffle(spark, sf_dir).collect()
    got = sorted((r["shard"], r["pos"], r["doc_id"]) for r in rows)

    def key(doc_id: int) -> int:
        return int(
            hashlib.md5(f"shuf:{doc_id}".encode()).hexdigest()[:15], 16
        )

    brute = sorted((key(r["doc_id"]), r["doc_id"]) for r in rows)
    assert [d for _, _, d in got] == [d for _, d in brute]
    # shard is the key's top bits; pos restarts at 1 per shard
    seen_pos = {}
    for s, p, d in got:
        assert s == key(d) // ((1 << 60) // SHUFFLE_SHARDS)
        assert p == seen_pos.get(s, 0) + 1
        seen_pos[s] = p
    # balance: no shard holds more than ~6x the mean (n=100 docs over
    # 64 shards is a rough Poisson; this catches a broken split, not
    # statistical noise)
    mean = len(rows) / SHUFFLE_SHARDS
    assert max(seen_pos.values()) <= max(6 * mean, 8)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        (d, s): (sh, p)
        for d, s, sh, p in con.execute(_GLOBAL_SHUFFLE_ORACLE).fetchall()
    }
    assert {
        (r["doc_id"], r["source"]): (r["shard"], r["pos"]) for r in rows
    } == want


def test_dsir_resample_plan_is_take_ordered(spark, sf_dir):
    """The registered resample's docstring claims the top-k compiles
    to TakeOrderedAndProject (per-partition heaps + k-row merge), not
    a global Sort — pin it in the physical plan."""
    from iceberg_by_example_spark.operators.sampling import (
        pipeline_dsir_resample,
    )

    plan = (
        pipeline_dsir_resample(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    # no global sort: every Sort in the plan (if any) is join-local,
    # never a Sort directly over the keyed weights with global=true
    assert "Sort [gumbel_key" not in plan


def test_source_kmv_sketches_merge_associatively(spark, sf_dir):
    """The sketch-union property the 100 TB story rests on: the
    bottom-k of a source computed over the WHOLE corpus equals the
    bottom-k of the union of per-shard bottom-k sketches — so shards
    (days, files, partitions) can sketch independently and merge."""
    from iceberg_by_example_spark.operators.dedup import (
        KMV_K,
        source_kmv_sketches,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents")
    whole = {}
    for r in source_kmv_sketches(docs).collect():
        whole.setdefault(r["source"], set()).add(r["h"])

    shard_a = docs.filter(F.col("doc_id") % 2 == 0)
    shard_b = docs.filter(F.col("doc_id") % 2 == 1)
    merged = {}
    for shard in (shard_a, shard_b):
        for r in source_kmv_sketches(shard).collect():
            merged.setdefault(r["source"], []).append(r["h"])
    remerged = {
        s: set(sorted(set(hs))[:KMV_K]) for s, hs in merged.items()
    }
    assert remerged == whole


def test_temperature_mix_matches_duckdb_twin(spark, sf_dir):
    """_TEMPERATURE_MIX_ORACLE (the future registration oracle) must
    produce row-identical output — including bit-identical double
    shares, which divide exact integers in both engines."""
    import duckdb

    from iceberg_by_example_spark.operators.sampling import (
        _TEMPERATURE_MIX_ORACLE,
        pipeline_temperature_mix,
    )

    got = {
        r["source"]: (
            r["source_tokens"],
            r["natural_share"],
            r["temp_share"],
            r["boost"],
        )
        for r in pipeline_temperature_mix(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        s: (int(n), ns, ts, b)
        for s, n, ns, ts, b in con.execute(
            _TEMPERATURE_MIX_ORACLE
        ).fetchall()
    }
    assert got == want


def test_incremental_winnow_matches_duckdb_twin(spark, sf_dir):
    """_INCREMENTAL_WINNOW_ORACLE (the queued registration oracle)
    must produce row-identical (batch_doc, corpus_doc, shared_keys)
    output on the real corpus."""
    import duckdb

    from iceberg_by_example_spark.operators.dedup import (
        _INCREMENTAL_WINNOW_ORACLE,
        dedup_incremental_winnow,
    )

    got = {
        (r["batch_doc"], r["corpus_doc"]): r["shared_keys"]
        for r in dedup_incremental_winnow(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        (b, c): int(k)
        for b, c, k in con.execute(_INCREMENTAL_WINNOW_ORACLE).fetchall()
    }
    assert got == want


def test_quality_cdf_matches_duckdb_twin_and_window_form(spark, sf_dir):
    """Two pins on the histogram-CDF normalization: (a) the DuckDB
    twin (_QUALITY_CDF_ORACLE, the future registration oracle) is
    row-identical; (b) pct_milli equals the per-doc percent_rank a
    window would compute — (strictly-below count) div (n-1) with ties
    sharing a value — recomputed brute-force in Python."""
    import duckdb

    from iceberg_by_example_spark.operators.text import (
        _QUALITY_CDF_ORACLE,
        QCDF_SCALE,
        text_quality_cdf,
    )

    rows = text_quality_cdf(spark, sf_dir).collect()
    got = {
        r["doc_id"]: (r["lang"], r["q_milli"], r["pct_milli"], r["decile"])
        for r in rows
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        d: (lang, int(q), int(p), int(dec))
        for d, lang, q, p, dec in con.execute(
            _QUALITY_CDF_ORACLE
        ).fetchall()
    }
    assert got == want

    by_lang = {}
    for d, (lang, q, _, _) in got.items():
        by_lang.setdefault(lang, []).append((d, q))
    for lang, pairs in by_lang.items():
        qs = sorted(q for _, q in pairs)
        n = len(qs)
        for d, q in pairs:
            below = sum(1 for x in qs if x < q)
            assert got[d][2] == (below * QCDF_SCALE) // max(n - 1, 1), d
            assert got[d][3] == min((below * 10) // max(n, 1), 9), d


def test_threshold_sweep_matches_duckdb_twin_and_monotone(spark, sf_dir):
    """_THRESHOLD_SWEEP_ORACLE must be row-identical, and the curve
    must be monotone non-increasing in θ (pairs and docs both) with
    every count consistent with a brute-force filter of the pair
    relation."""
    import duckdb

    from iceberg_by_example_spark.operators.dedup import (
        _THRESHOLD_SWEEP_ORACLE,
        SWEEP_THRESHOLDS,
        dedup_threshold_sweep,
        dedup_ngram_jaccard,
    )

    got = {
        r["threshold_pct"]: (r["n_pairs"], r["n_docs"])
        for r in dedup_threshold_sweep(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        int(t): (int(p), int(d))
        for t, p, d in con.execute(_THRESHOLD_SWEEP_ORACLE).fetchall()
    }
    assert got == want
    present = [t for t in SWEEP_THRESHOLDS if t in got]
    assert present, "sweep produced no thresholds at all"
    for lo, hi in zip(present, present[1:]):
        assert got[lo][0] >= got[hi][0]
        assert got[lo][1] >= got[hi][1]
    pairs = [
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    ]
    for t in present:
        surv = [(a, b) for a, b, j in pairs if j * 100 >= t]
        assert got[t][0] == len(surv)
        assert got[t][1] == len({d for p in surv for d in p})


# ---------------------------------------------------------------------------
# Learned quality filter: logistic-regression training steps
# ---------------------------------------------------------------------------


def _lr_python_twin(docs):
    """From-scratch integer-exact twin of pipeline_quality_lr_step:
    (doc rows as (doc_id, lang, text)) -> {bucket: (w1, w2)}."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from iceberg_by_example_spark.operators.pipeline import (
        LR_DEN,
        LR_LABEL_LANG,
        LR_SCALE,
    )
    from iceberg_by_example_spark.operators.text import HASHING_DIM

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % (
            HASHING_DIM
        )

    rows = []
    for _doc_id, lang, text in docs:
        f = [0] * HASHING_DIM
        for tok in text.split(" "):
            f[bucket(tok)] += 1
        rows.append((1 if lang == LR_LABEL_LANG else 0, f))
    n = len(rows)
    g0 = [0] * HASHING_DIM
    for y, f in rows:
        r = 500_000 - 1_000_000 * y
        for b in range(HASHING_DIM):
            g0[b] += r * f[b]
    # Spark/DuckDB integer `div` truncates toward zero
    w1 = []
    for b in range(HASHING_DIM):
        q = abs(g0[b]) // (n * LR_DEN)
        w1.append(-(q if g0[b] >= 0 else -q))
    g1 = [0] * HASHING_DIM
    for y, f in rows:
        z = sum(w1[b] * f[b] for b in range(HASHING_DIM))
        p = float(LR_SCALE) / (1.0 + math.exp(-(float(z) / LR_SCALE)))
        p_micro = int(
            Decimal(p).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )
        r = p_micro - 1_000_000 * y
        for b in range(HASHING_DIM):
            g1[b] += r * f[b]
    out = {}
    for b in range(HASHING_DIM):
        q = abs(g1[b]) // (n * LR_DEN)
        step = q if g1[b] >= 0 else -q
        out[b] = (w1[b], w1[b] - step)
    return out


def test_quality_lr_step_matches_python_and_duckdb(spark, sf_dir):
    """Three pins on the distributed LR trainer: (a) the DuckDB twin
    (_quality_lr_oracle, the future registration oracle) is
    row-identical; (b) a from-scratch pure-Python trainer reproduces
    every weight exactly (integer div toward zero, ROUND-once sigmoid
    included); (c) the classifier actually LEARNS — step-2 mean
    |residual| on the training corpus is strictly below step-1's
    constant 0.5."""
    import duckdb

    from iceberg_by_example_spark.operators.pipeline import (
        _quality_lr_oracle,
        pipeline_quality_lr_step,
    )

    got = {
        r["bucket"]: (r["w1_micro"], r["w2_micro"])
        for r in pipeline_quality_lr_step(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        b: (int(w1), int(w2))
        for b, w1, w2 in con.execute(_quality_lr_oracle()).fetchall()
    }
    assert got == want

    docs = con.execute(
        "SELECT doc_id, lang, text FROM documents"
    ).fetchall()
    assert got == _lr_python_twin(docs)

    # learning signal: with w2 the mean |sigma(w.x) - y| must beat the
    # w=0 baseline's exact 0.5
    import math

    from iceberg_by_example_spark.operators.pipeline import (
        LR_LABEL_LANG,
        LR_SCALE,
    )
    from iceberg_by_example_spark.operators.text import HASHING_DIM
    import hashlib

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % (
            HASHING_DIM
        )

    t1 = t2 = 0.0
    for _d, lang, text in docs:
        f = [0] * HASHING_DIM
        for tok in text.split(" "):
            f[bucket(tok)] += 1
        y = 1 if lang == LR_LABEL_LANG else 0
        z1 = sum(got[b][0] * f[b] for b in range(HASHING_DIM))
        z2 = sum(got[b][1] * f[b] for b in range(HASHING_DIM))
        t1 += abs(1.0 / (1.0 + math.exp(-(z1 / LR_SCALE))) - y)
        t2 += abs(1.0 / (1.0 + math.exp(-(z2 / LR_SCALE))) - y)
    n = len(docs)
    # strict descent: w0=0 scores 0.5 everywhere; each step improves
    assert t2 / n < t1 / n < 0.5


def test_quality_score_matches_duckdb_and_gate_semantics(spark, sf_dir):
    """The train→apply loop's scoring half: (a) the DuckDB twin
    (_quality_score_oracle) is row-identical; (b) the keep gate is
    exactly 'top 1/LR_KEEP_DEN by score, cutoff-ties kept' — kept
    count >= ceil(n/den), every kept score >= every dropped score,
    and everything tied with the cutoff is kept; (c) scoring with the
    trainer's materialized weights (the weights= path the composed
    pipeline uses) is bit-identical to self-training; (d) the filter
    actually filters: the kept half is enriched in the training label
    relative to the dropped half."""
    import duckdb

    from iceberg_by_example_spark.operators.pipeline import (
        LR_KEEP_DEN,
        LR_LABEL_LANG,
        _quality_score_oracle,
        pipeline_quality_lr_step,
        pipeline_quality_score,
    )

    got = {
        r["doc_id"]: (r["p_micro"], r["keep"])
        for r in pipeline_quality_score(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        d: (int(p), int(k))
        for d, p, k in con.execute(_quality_score_oracle()).fetchall()
    }
    assert got == want

    n = len(got)
    kept = {d: p for d, (p, k) in got.items() if k == 1}
    dropped = {d: p for d, (p, k) in got.items() if k == 0}
    assert len(kept) >= (n + LR_KEEP_DEN - 1) // LR_KEEP_DEN
    assert kept and dropped
    cutoff = min(kept.values())
    assert all(p < cutoff for p in dropped.values())
    # ties at the cutoff are kept, so removing the tie group must
    # drop the count below the target — cutoff is the MAX such score
    assert len([p for p in kept.values() if p > cutoff]) < (
        n + LR_KEEP_DEN - 1
    ) // LR_KEEP_DEN

    w = pipeline_quality_lr_step(spark, sf_dir)
    got_w = {
        r["doc_id"]: (r["p_micro"], r["keep"])
        for r in pipeline_quality_score(
            spark, sf_dir, weights=w
        ).collect()
    }
    assert got_w == got

    lang = dict(
        con.execute("SELECT doc_id, lang FROM documents").fetchall()
    )
    rate = lambda ds: sum(  # noqa: E731
        1 for d in ds if lang[d] == LR_LABEL_LANG
    ) / len(ds)
    assert rate(kept) > rate(dropped)


def test_filter_funnel_with_lr_scores(spark, sf_dir):
    """The funnel's optional learned-filter gate: with lr_scores
    attached, docs surviving the heuristics but scored keep=0 land in
    a new lr_rejected stage (idx 4, kept moves to 5); heuristic-stage
    counts are untouched; stage counts still sum to the corpus; and
    the no-argument registered form is byte-identical to before."""
    from iceberg_by_example_spark.operators.pipeline import (
        pipeline_filter_funnel,
        pipeline_quality_score,
    )

    base = {
        r["stage"]: (r["stage_idx"], r["n_docs"])
        for r in pipeline_filter_funnel(spark, sf_dir).collect()
    }
    scores = pipeline_quality_score(spark, sf_dir)
    got = {
        r["stage"]: (r["stage_idx"], r["n_docs"])
        for r in pipeline_filter_funnel(
            spark, sf_dir, lr_scores=scores
        ).collect()
    }
    # heuristic stages unchanged (first-failure semantics: the LR
    # gate only sees docs that survived them)
    for s in ("too_short", "low_diversity", "no_stopwords"):
        if s in base:
            assert got[s] == base[s]
    assert sum(n for _, n in got.values()) == sum(
        n for _, n in base.values()
    )
    assert got["kept"][0] == 5
    n_dropped_by_lr = base["kept"][1] - got["kept"][1]
    assert got.get("lr_rejected", (4, 0))[1] == n_dropped_by_lr
    if "lr_rejected" in got:
        assert got["lr_rejected"][0] == 4
        assert n_dropped_by_lr > 0
    # cross-check against the joined per-doc truth
    lr_dropped_ids = {
        r["doc_id"]
        for r in scores.where(F.col("keep") == 0).collect()
    }
    from iceberg_by_example_spark.operators.pipeline import (
        FUNNEL_MIN_STOP_RATIO,
        FUNNEL_MIN_TOKENS,
        FUNNEL_MIN_TTR,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents").collect()

    def survives(text):
        toks = text.split(" ")
        n = len(toks)
        if n < FUNNEL_MIN_TOKENS:
            return False
        if len(set(toks)) / n < FUNNEL_MIN_TTR:
            return False
        from iceberg_by_example_spark.functions.text import STOPWORDS

        sw = sum(1 for t in toks if t in STOPWORDS["en"])
        return sw / n >= FUNNEL_MIN_STOP_RATIO

    want_lr_rejected = sum(
        1
        for r in docs
        if survives(r["text"]) and r["doc_id"] in lr_dropped_ids
    )
    assert n_dropped_by_lr == want_lr_rejected


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (SentencePiece family)
# ---------------------------------------------------------------------------


def _ref_uni_viterbi(word, scores, unk):
    """Independent reference Viterbi: recursive memo over suffixes,
    explicit tie-break (max score, then fewest pieces, then the
    lexicographically smallest sequence). Integer arithmetic — must
    agree with unigram_encode EXACTLY."""
    from functools import lru_cache

    max_len = max((len(p) for p in scores), default=1)

    @lru_cache(maxsize=None)
    def best_from(i):
        if i == len(word):
            return (0, 0, ())
        cands = []
        for j in range(i + 1, min(i + max_len, len(word)) + 1):
            piece = word[i:j]
            s = scores.get(piece)
            if s is None:
                if j - i > 1:
                    continue
                s = unk
            tail = best_from(j)
            cands.append(
                (tail[0] + s, tail[1] - 1, (piece,) + tail[2])
            )
        # max by (score, -n_pieces); ties -> lexicographically smallest
        best = cands[0]
        for c in cands[1:]:
            if (c[0], c[1]) > (best[0], best[1]) or (
                (c[0], c[1]) == (best[0], best[1]) and c[2] < best[2]
            ):
                best = c
        return best

    return list(best_from(0)[2])


def test_unigram_trainer_and_viterbi_reference(spark):
    """The unigram trainer against an independent from-scratch EM
    (forward-backward expected counts, same summation order spec) and
    the integer Viterbi against an independent recursive decoder:
    scores agree within 2 micro, segmentations agree EXACTLY, and the
    EM log-likelihood trace is monotone non-decreasing (the textbook
    EM guarantee)."""
    import math

    from iceberg_by_example_spark.operators.tokenizer import (
        UNI_UNK_SCORE,
        bpe_word_counts,
        unigram_encode,
        unigram_train,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    head = [
        (r["w"], r["freq"]) for r in bpe_word_counts(docs, 4096).collect()
    ]
    scores, lls = unigram_train(head)
    assert len(lls) == 3
    for prev, cur in zip(lls, lls[1:]):
        assert cur >= prev - abs(prev) * 1e-12, (prev, cur)

    # --- independent EM (different structure: explicit edge lists) ---
    from collections import Counter

    MAXP, SEEDC, PIECEC, SCALE = 6, 2000, 512, 1_000_000
    seed = Counter()
    for w, f in head:
        for i in range(len(w)):
            for j in range(i + 1, min(i + MAXP, len(w)) + 1):
                seed[w[i:j]] += f
    chars = sorted({c for w, _ in head for c in w})
    multi = sorted(
        (p for p in seed if len(p) > 1), key=lambda p: (-seed[p], p)
    )[: SEEDC - len(chars)]
    pieces = sorted(set(chars) | set(multi))
    total = float(sum(seed[p] for p in pieces))
    probs = {p: seed[p] / total for p in pieces}
    for _ in range(3):
        exp = {}
        for w, f in head:
            n = len(w)
            a = [0.0] * (n + 1)
            a[0] = 1.0
            for j in range(1, n + 1):
                s = 0.0
                for i in range(max(0, j - MAXP), j):
                    pr = probs.get(w[i:j])
                    if pr:
                        s += a[i] * pr
                a[j] = s
            if a[n] <= 0:
                continue
            b = [0.0] * (n + 1)
            b[n] = 1.0
            for i in range(n - 1, -1, -1):
                s = 0.0
                for j in range(i + 1, min(i + MAXP, n) + 1):
                    pr = probs.get(w[i:j])
                    if pr:
                        s += pr * b[j]
                b[i] = s
            inv = f / a[n]
            for i in range(n):
                for j in range(i + 1, min(i + MAXP, n) + 1):
                    pr = probs.get(w[i:j])
                    if pr:
                        c = a[i] * pr * b[j] * inv
                        if c:
                            exp[w[i:j]] = exp.get(w[i:j], 0.0) + c
        for c0 in chars:
            exp[c0] = exp.get(c0, 0.0) + 1e-9
        tot = sum(exp.get(p, 0.0) for p in pieces)
        probs = {
            p: exp.get(p, 0.0) / tot
            for p in pieces
            if exp.get(p, 0.0) > 0
        }
    kept_multi = sorted(
        (p for p in probs if len(p) > 1), key=lambda p: (-probs[p], p)
    )[: PIECEC - len(chars)]
    kept = sorted(set(chars) | set(kept_multi))
    tot = sum(probs.get(p, 0.0) for p in kept)
    from decimal import ROUND_HALF_UP, Decimal

    want = {
        p: int(
            Decimal(
                math.log(probs.get(p, 1e-12) / tot) * SCALE
            ).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )
        for p in kept
    }
    assert set(scores) == set(want)
    for p in scores:
        assert abs(scores[p] - want[p]) <= 2, (p, scores[p], want[p])

    # --- Viterbi agreement, in-vocab and crafted OOV words ---
    probe = [w for w, _ in head[:200]] + [
        "zzzqqq",
        "the9fox",  # digit never appears: UNK fallback path
        "a",
        "tablescan" * 3,
    ]
    for w in probe:
        assert unigram_encode(w, scores) == _ref_uni_viterbi(
            w, scores, UNI_UNK_SCORE
        ), w
    # the most frequent word must compress below its char count
    top_word = head[0][0]
    if len(top_word) > 1:
        assert len(unigram_encode(top_word, scores)) < len(top_word)


def test_unigram_stats_spark_plumbing_exact(spark, sf_dir):
    """The Spark accounting (head broadcast join + distinct-OOV pandas
    UDF) must reproduce a pure-Python corpus accounting computed with
    the library's own scores — every doc, all four counters."""
    import re

    import duckdb

    from iceberg_by_example_spark.operators.tokenizer import (
        text_unigram_tokenize,
        unigram_encode,
        unigram_learn_from_corpus,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents")
    scores, _lls, head = unigram_learn_from_corpus(docs)
    vocab = {w for w, _ in head}
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_pieces"],
            r["n_oov_words"],
            r["n_oov_pieces"],
        )
        for r in text_unigram_tokenize(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    n_cache = {}
    want = {}
    for doc_id, text in rows:
        words = re.findall("[a-z]+", text.lower())
        if not words:
            continue
        nw = np_ = now = nop = 0
        for w in words:
            if w not in n_cache:
                n_cache[w] = len(unigram_encode(w, scores))
            k = n_cache[w]
            nw += 1
            np_ += k
            if w not in vocab:
                now += 1
                nop += k
        want[doc_id] = (nw, np_, now, nop)
    assert got == want


# ---------------------------------------------------------------------------
# End-to-end composed curation pipeline
# ---------------------------------------------------------------------------


def _lr_quota_python(per_source, pow_q, pow_tot, target):
    """The pure-Python twin of _curate_quota: capped floors, ONE
    largest-remainder seat per eligible source, then the cap-residue
    greedy over remaining headroom in the same order. per_source maps
    source -> (tokens, n_docs)."""
    flc = {
        s: min(per_source[s][1], pow_q[s] * target // pow_tot)
        for s in per_source
    }
    headroom = {s: per_source[s][1] - flc[s] for s in per_source}
    deficit = target - sum(flc.values())
    elig = sorted(
        (s for s in per_source if headroom[s] > 0),
        key=lambda s: (-(pow_q[s] * target % pow_tot), s),
    )
    quota = dict(flc)
    seat1 = set(elig[:deficit])
    for s in seat1:
        quota[s] += 1
    d2 = deficit - len(seat1)
    for s in elig:
        take = min(headroom[s] - (1 if s in seat1 else 0), d2)
        quota[s] += take
        d2 -= take
    assert d2 == 0 and sum(quota.values()) == target
    return quota


@pytest.mark.parametrize("size_source", ["whitespace", "bpe"])
def test_curate_corpus_equals_stage_by_stage_chain(
    spark, sf_dir, size_source
):
    """The composed one-job curation pipeline must equal materializing
    the chain stage by stage: survivors = heuristic pass ∩ exact-dedup
    winners minus cluster losers minus bench slice minus contaminated
    ∩ LR keeps (each from the STANDALONE operator), then quota /
    selection / shuffle / packing recomputed INDEPENDENTLY in Python
    (hashlib keys, integer quota arithmetic, dict-based prefix-sum
    packing). Any scan-sharing or persist in the composition that
    changed a row would fail the set equality. Parametrized over the
    size provider (r13 VERDICT #5): the bpe variant sizes quota AND
    packs by capped-vocab LEARNED piece counts (vocab_cap=16 so OOV
    words really encode multi-piece), and must still equal the
    independent recomputation over those counts."""
    import hashlib

    from iceberg_by_example_spark.operators.dedup import (
        dedup_cluster_canonical,
        dedup_exact,
    )
    from iceberg_by_example_spark.operators.pipeline import (
        DECON_BENCH_BUCKET,
        MIX_DOC_BUDGET_DEN,
        _funnel_metrics,
        _funnel_pass,
        pipeline_curate_corpus,
        pipeline_decontaminate,
        pipeline_quality_score,
    )
    from iceberg_by_example_spark.operators.sampling import (
        SHUFFLE_SHARD_WIDTH,
        _mix_pow,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    bpe_kw = {} if size_source == "whitespace" else {"vocab_cap": 16}
    got = {
        (
            r["shard"],
            r["pack_id"],
            r["n_docs"],
            r["pack_tokens"],
            r["first_doc"],
            r["last_doc"],
        )
        for r in pipeline_curate_corpus(
            spark, sf_dir, size_source=size_source, **bpe_kw
        ).collect()
    }

    # --- stage-by-stage chain, each stage materialized separately ---
    d = load_table(spark, sf_dir, "documents")
    heur = {
        r["doc_id"]
        for r in _funnel_metrics(d).filter(_funnel_pass()).collect()
    }
    exact = {r["doc_id"] for r in dedup_exact(spark, sf_dir).collect()}
    losers = {
        r["doc_id"]
        for r in dedup_cluster_canonical(spark, sf_dir)
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .collect()
    }
    contaminated = {
        r["doc_id"]
        for r in pipeline_decontaminate(spark, sf_dir)
        .filter("contaminated")
        .collect()
    }
    lr_keep = {
        r["doc_id"]
        for r in pipeline_quality_score(spark, sf_dir)
        .filter(F.col("keep") == 1)
        .collect()
    }

    def bench_bucket(doc_id):
        return hashlib.md5(f"bench:{doc_id}".encode()).hexdigest()[:2]

    if size_source == "whitespace":
        docs = {
            r["doc_id"]: (r["source"], len(r["text"].split(" ")))
            for r in d.collect()
        }
    else:
        from iceberg_by_example_spark.operators.tokenizer import (
            bpe_tokenize_stats,
        )

        pieces = {
            r["doc_id"]: r["n_pieces"]
            for r in bpe_tokenize_stats(d, **bpe_kw).collect()
        }
        docs = {
            r["doc_id"]: (r["source"], pieces.get(r["doc_id"], 0))
            for r in d.select("doc_id", "source").collect()
        }
    surv = [
        doc_id
        for doc_id in docs
        if doc_id in heur
        and doc_id in exact
        and doc_id not in losers
        and bench_bucket(doc_id) >= DECON_BENCH_BUCKET
        and doc_id not in contaminated
        and doc_id in lr_keep
    ]
    assert surv, "chain produced no survivors — test corpus too small"

    # --- quota: exact integer shares of the Spark-computed pow_q ---
    per_source: dict = {}
    for doc_id in surv:
        s, n = docs[doc_id]
        tok, cnt = per_source.get(s, (0, 0))
        per_source[s] = (tok + n, cnt + 1)
    ps_df = spark.createDataFrame(
        [(s, t) for s, (t, _) in per_source.items()],
        "source string, source_tokens long",
    )
    pow_q = {
        r["source"]: int(r["pow_q"]) for r in _mix_pow(ps_df).collect()
    }
    pow_tot = sum(pow_q.values())
    n_surv = len(surv)
    target = (n_surv + MIX_DOC_BUDGET_DEN - 1) // MIX_DOC_BUDGET_DEN
    quota = _lr_quota_python(per_source, pow_q, pow_tot, target)

    # --- selection: first quota docs per source in shuffle-key order ---
    def k60(doc_id):
        return int(
            hashlib.md5(f"shuf:{doc_id}".encode()).hexdigest()[:15], 16
        )

    by_source: dict = {}
    for doc_id in surv:
        by_source.setdefault(docs[doc_id][0], []).append(doc_id)
    selected = []
    for s, ids in by_source.items():
        ids.sort(key=lambda i: (k60(i), i))
        selected.extend(ids[: quota[s]])
    assert 0 < len(selected) < n_surv

    # --- shuffle + pack, dict-based ---
    by_shard: dict = {}
    for doc_id in selected:
        by_shard.setdefault(k60(doc_id) // SHUFFLE_SHARD_WIDTH, []).append(
            doc_id
        )
    want = set()
    for shard, ids in by_shard.items():
        ids.sort(key=lambda i: (k60(i), i))
        packs: dict = {}
        cum = 0
        for doc_id in ids:
            pid = cum // 2048
            n = docs[doc_id][1]
            nd, pt, fd, ld = packs.get(pid, (0, 0, doc_id, doc_id))
            packs[pid] = (nd + 1, pt + n, min(fd, doc_id), max(ld, doc_id))
            cum += n
        for pid, (nd, pt, fd, ld) in packs.items():
            want.add((shard, pid, nd, pt, fd, ld))
    assert got == want


def test_pack_learned_matches_python_pack_over_piece_counts(
    spark, sf_dir
):
    """The learned-budget packer must equal a pure-Python streaming
    pack over the (already independently pinned) per-doc BPE piece
    counts — and, under a capped-vocab training whose OOV words
    encode multi-piece, must actually differ from the
    whitespace-budget packer (at the fully-trained default this tiny
    corpus's every word is one piece, so the default packs equal the
    whitespace packs — asserted too, as corpus documentation)."""
    from iceberg_by_example_spark.operators.sampling import (
        pipeline_pack_learned,
    )
    from iceberg_by_example_spark.operators.tokenizer import (
        bpe_tokenize_stats,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    got = {
        tuple(r) for r in pipeline_pack_learned(spark, sf_dir).collect()
    }

    docs = load_table(spark, sf_dir, "documents")
    pieces = {
        r["doc_id"]: r["n_pieces"]
        for r in bpe_tokenize_stats(docs).collect()
    }
    src = {
        r["doc_id"]: r["source"]
        for r in docs.select("doc_id", "source").collect()
    }
    by_source: dict = {}
    for doc_id, s in src.items():
        by_source.setdefault(s, []).append(doc_id)
    want = set()
    for s, ids in by_source.items():
        ids.sort()
        packs: dict = {}
        cum = 0
        for doc_id in ids:
            pid = cum // 2048
            n = pieces[doc_id]
            nd, pt, fd, ld = packs.get(pid, (0, 0, doc_id, doc_id))
            packs[pid] = (nd + 1, pt + n, min(fd, doc_id), max(ld, doc_id))
            cum += n
        for pid, (nd, pt, fd, ld) in packs.items():
            want.add((s, pid, nd, pt, fd, ld))
    assert got == want

    from iceberg_by_example_spark.plans.registry import QUERY_REGISTRY

    ws = {
        tuple(r)
        for r in QUERY_REGISTRY["pipeline_pack_sequences"]
        .fn(spark, sf_dir)
        .collect()
    }
    # fully-trained on this narrow vocabulary: 1 piece per word
    assert got == ws
    # capped vocab -> OOV words encode multi-piece -> boundaries move
    capped = {
        tuple(r)
        for r in pipeline_pack_learned(
            spark, sf_dir, vocab_cap=16
        ).collect()
    }
    assert capped != ws
    assert sum(r[3] for r in capped) > sum(r[3] for r in ws)


def test_filter_funnel_partial_lr_scores_null_is_pass(spark, sf_dir):
    """r13 ADVICE #1: a PARTIAL score frame must not deflate the
    funnel — the join is left, a doc with no score row passes the LR
    gate (null keep = pass), so totals still sum to the corpus and
    heuristic-stage counts are byte-identical to the full-score run."""
    from iceberg_by_example_spark.operators.pipeline import (
        pipeline_filter_funnel,
        pipeline_quality_score,
    )

    scores = pipeline_quality_score(spark, sf_dir)
    full = {
        r["stage"]: (r["stage_idx"], r["n_docs"])
        for r in pipeline_filter_funnel(
            spark, sf_dir, lr_scores=scores
        ).collect()
    }
    # drop the score rows for half the docs (odd doc_ids)
    partial = scores.filter(F.col("doc_id") % 2 == 0)
    got = {
        r["stage"]: (r["stage_idx"], r["n_docs"])
        for r in pipeline_filter_funnel(
            spark, sf_dir, lr_scores=partial
        ).collect()
    }
    total = sum(n for _, n in full.values())
    assert sum(n for _, n in got.values()) == total
    for s in ("too_short", "low_diversity", "no_stopwords"):
        if s in full:
            assert got[s] == full[s]
    # unscored docs pass the gate: lr_rejected can only shrink and
    # kept can only grow relative to the full-score run
    assert got.get("lr_rejected", (4, 0))[1] <= full.get(
        "lr_rejected", (4, 0)
    )[1]
    assert got["kept"][1] >= full["kept"][1]
    # exactly the odd-doc_id rejects that SURVIVE the heuristics moved
    # from lr_rejected to kept (first-failure attribution: docs the
    # heuristics already dropped never reach the LR gate)
    from iceberg_by_example_spark.operators.pipeline import (
        _funnel_metrics,
        _funnel_pass,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    heur_pass = _funnel_metrics(
        load_table(spark, sf_dir, "documents")
    ).filter(_funnel_pass()).select("doc_id")
    odd_rejects = (
        scores.filter((F.col("keep") == 0) & (F.col("doc_id") % 2 == 1))
        .join(heur_pass, "doc_id", "left_semi")
        .count()
    )
    assert (
        full.get("lr_rejected", (4, 0))[1]
        - got.get("lr_rejected", (4, 0))[1]
        == odd_rejects
    )


def test_winnow_index_missing_signature_is_guard_failure(spark):
    """r13 ADVICE #4: an index table whose plan-signature property is
    ABSENT (pre-guard build, or a path that lost the ALTER TABLE) must
    fail the reuse guard instead of silently serving whatever corpus
    it was built from."""
    import os

    import pytest as _pytest

    from iceberg_by_example_spark.operators.dedup import (
        winnow_index_table,
        winnow_keys,
    )

    keys = winnow_keys(_planted_substring_corpus(spark)).filter(
        F.col("doc_id") < 5
    )
    winnow_index_table(spark, keys, name="widx_nosig")
    spark.sql(
        f"ALTER TABLE winnowidx_{os.getpid()}.widx_nosig "
        "UNSET TBLPROPERTIES ('winnow.corpus_plan_sig')"
    )
    with _pytest.raises(ValueError, match="<missing>"):
        winnow_index_table(spark, keys, name="widx_nosig")
    # refresh=True rebuilds and restores the stamped guard
    rebuilt = winnow_index_table(
        spark, keys, name="widx_nosig", refresh=True
    )
    assert rebuilt.count() == keys.count()
    winnow_index_table(spark, keys, name="widx_nosig")  # reuse ok again


def test_pack_stats_pack_id_exact_past_double_precision(spark):
    """r13 ADVICE #3: pack_id is the exact integral quotient, not a
    double division — at a cumulative prefix of 2^60 - 1 tokens the
    double rounds UP across the pack boundary and floor() would
    misassign the pack by one."""
    from iceberg_by_example_spark.operators.sampling import pack_stats

    big = (1 << 60) - 1
    sized = spark.createDataFrame(
        [(1, "s", big), (2, "s", 10)],
        "doc_id long, source string, n_tokens long",
    )
    rows = {
        r["pack_id"]: (r["n_docs"], r["first_doc"])
        for r in pack_stats(sized, ["source"], ["doc_id"]).collect()
    }
    assert rows == {0: (1, 1), big // 2048: (1, 2)}
    # the double-floor answer would be one pack later
    assert big // 2048 != int(float(big) // 2048.0)


def test_curate_quota_hits_target_exactly_adversarial(spark):
    """r13 VERDICT #4: floor + headroom-aware largest-remainder seats
    — the selected count equals ceil(n/2) EXACTLY for adversarial
    share distributions, including cap-binding ones (a source whose
    temperature share exceeds its own doc count), single-source, and
    one-doc-per-source corpora. Cross-checked against a pure-Python
    greedy over the same pow_q fixed point."""
    from iceberg_by_example_spark.operators.pipeline import (
        MIX_DOC_BUDGET_DEN,
        _curate_select_pack,
    )
    from iceberg_by_example_spark.operators.sampling import _mix_pow

    cases = {
        # (source -> (n_docs, tokens_per_doc))
        "single": {"a": (7, 40)},
        "one_each": {f"s{i}": (1, 30 + i) for i in range(9)},
        # cap bind: 'giant' has a huge token mass (big pow_q share)
        # but only 2 docs — its floor share caps and the seats must
        # flow to the others
        "cap_bind": {"giant": (2, 100000), "t1": (40, 10), "t2": (40, 9)},
        "skewed": {"big": (50, 500), "m": (5, 50), "tiny": (3, 2)},
        # remainder tie-break: identical sources, odd target
        "ties": {"x1": (3, 25), "x2": (3, 25), "x3": (3, 25)},
    }
    for label, spec in cases.items():
        rows = []
        doc_id = 0
        for s, (nd, tok) in spec.items():
            for _ in range(nd):
                rows.append((doc_id, s, tok))
                doc_id += 1
        surv = spark.createDataFrame(
            rows, "doc_id long, source string, n_tokens long"
        )
        manifest = _curate_select_pack(surv).collect()
        n = len(rows)
        target = (n + MIX_DOC_BUDGET_DEN - 1) // MIX_DOC_BUDGET_DEN
        assert sum(r["n_docs"] for r in manifest) == target, label

        # per-source quota cross-check vs the Python greedy
        per_source = {s: (nd * tok, nd) for s, (nd, tok) in spec.items()}
        ps_df = spark.createDataFrame(
            [(s, t) for s, (t, _) in per_source.items()],
            "source string, source_tokens long",
        )
        pow_q = {
            r["source"]: int(r["pow_q"])
            for r in _mix_pow(ps_df).collect()
        }
        pow_tot = sum(pow_q.values())
        quota = _lr_quota_python(per_source, pow_q, pow_tot, target)
        assert sum(quota.values()) == target, label
        assert all(
            quota[s] <= per_source[s][1] for s in per_source
        ), label
        # r14 review finding: compare the PER-SOURCE quotas, not just
        # the selected total — a misallocation preserving the sum must
        # fail here
        from iceberg_by_example_spark.operators.pipeline import (
            _curate_quota,
        )

        got_quota = {
            r["source"]: r["quota"]
            for r in _curate_quota(surv).collect()
        }
        assert got_quota == quota, label
        # textbook largest-remainder property: no source exceeds its
        # exact floor share by more than 1 — holds when caps don't
        # bind AND enough sources have headroom for the one-seat pass
        # (a headroom-0-without-truncation source shrinks the eligible
        # pool and the residue greedy must stack seats — r14 review
        # counterexample)
        fl = {s: pow_q[s] * target // pow_tot for s in per_source}
        elig_n = sum(
            1 for s in per_source if per_source[s][1] - fl[s] > 0
        )
        deficit0 = target - sum(fl.values())
        if (
            all(fl[s] <= per_source[s][1] for s in per_source)
            and elig_n >= deficit0
        ):
            for s in per_source:
                assert quota[s] - fl[s] <= 1, (label, s)


# ---------------------------------------------------------------------------
# Incremental curation: the steady-state daily ingest (r13 VERDICT #3)
# ---------------------------------------------------------------------------


def _curate_day_split(spark, sf_dir):
    """Deterministic OLD/DAY split honoring the monotone-id contract:
    the top ~10% of doc_ids play today's ingest."""
    from iceberg_by_example_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    t = ids[int(len(ids) * 0.9)]
    return (
        docs.filter(F.col("doc_id") < t),
        docs.filter(F.col("doc_id") >= t),
        t,
    )


def test_curate_ingest_day_equals_full_recompute_cross_slice(
    spark, sf_dir
):
    """The incremental daily ingest's survivor decisions must equal
    the FULL recompute's decisions for the day's docs: survivors of
    ``pipeline_curate_ingest_day`` over (standing state from OLD,
    batch = DAY, stored model constants from the full corpus) ==
    {full-chain survivors over OLD ∪ DAY} ∩ DAY — exact dedup,
    near-dup components, benchmark carve, decontamination (union
    vocabulary), and the stored-weight LR gate all included. And the
    day manifest must equal an independent Python recomputation of
    the updated-mass quota / selection / shuffle / pack tail."""
    import hashlib

    from iceberg_by_example_spark.operators.dedup import (
        dedup_cluster_canonical,
        dedup_exact,
    )
    from iceberg_by_example_spark.operators.pipeline import (
        DECON_BENCH_BUCKET,
        MIX_DOC_BUDGET_DEN,
        _funnel_metrics,
        _funnel_pass,
        build_curate_state,
        pipeline_curate_ingest_day,
        pipeline_decontaminate,
        pipeline_quality_score,
    )
    from iceberg_by_example_spark.operators.sampling import (
        SHUFFLE_SHARD_WIDTH,
        _mix_pow,
    )
    from iceberg_by_example_spark.sources.tpch import load_table
    from iceberg_by_example_spark.streaming.quality import (
        batch_trained_filter,
    )

    old, day, t = _curate_day_split(spark, sf_dir)
    w2, keep_micro = batch_trained_filter(spark, sf_dir)
    state = build_curate_state(spark, old, w2, keep_micro)

    got_surv = {
        r["doc_id"]: (r["source"], r["n_tokens"])
        for r in pipeline_curate_ingest_day(
            spark, state, day, return_survivors=True
        ).collect()
    }

    # --- full recompute over OLD ∪ DAY, stage by standalone stage ---
    d = load_table(spark, sf_dir, "documents")
    heur = {
        r["doc_id"]
        for r in _funnel_metrics(d).filter(_funnel_pass()).collect()
    }
    exact = {r["doc_id"] for r in dedup_exact(spark, sf_dir).collect()}
    losers = {
        r["doc_id"]
        for r in dedup_cluster_canonical(spark, sf_dir)
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .collect()
    }
    contaminated = {
        r["doc_id"]
        for r in pipeline_decontaminate(spark, sf_dir)
        .filter("contaminated")
        .collect()
    }
    lr_keep = {
        r["doc_id"]
        for r in pipeline_quality_score(spark, sf_dir)
        .filter(F.col("keep") == 1)
        .collect()
    }

    def bench_bucket(doc_id):
        return hashlib.md5(f"bench:{doc_id}".encode()).hexdigest()[:2]

    docs_all = {
        r["doc_id"]: (r["source"], len(r["text"].split(" ")))
        for r in d.collect()
    }
    want_surv = {
        doc_id: docs_all[doc_id]
        for doc_id in docs_all
        if doc_id >= t
        and doc_id in heur
        and doc_id in exact
        and doc_id not in losers
        and bench_bucket(doc_id) >= DECON_BENCH_BUCKET
        and doc_id not in contaminated
        and doc_id in lr_keep
    }
    assert want_surv, "day slice produced no survivors — widen the split"
    assert got_surv == want_surv

    # --- manifest == Python recomputation over updated masses ---
    got_manifest = {
        tuple(r)
        for r in pipeline_curate_ingest_day(spark, state, day).collect()
    }
    standing = {
        r["source"]: int(r["source_tokens"])
        for r in state.source_stats.collect()
    }
    updated = dict(standing)
    per_source: dict = {}
    for doc_id, (s, n) in got_surv.items():
        updated[s] = updated.get(s, 0) + n
        tok, cnt = per_source.get(s, (0, 0))
        per_source[s] = (tok + n, cnt + 1)
    ps_df = spark.createDataFrame(
        [(s, t_) for s, t_ in updated.items()],
        "source string, source_tokens long",
    )
    pow_q = {
        r["source"]: int(r["pow_q"]) for r in _mix_pow(ps_df).collect()
    }
    pow_tot = sum(pow_q.values())
    n_surv = len(got_surv)
    target = (n_surv + MIX_DOC_BUDGET_DEN - 1) // MIX_DOC_BUDGET_DEN
    quota = _lr_quota_python(per_source, pow_q, pow_tot, target)

    def k60(doc_id):
        return int(
            hashlib.md5(f"shuf:{doc_id}".encode()).hexdigest()[:15], 16
        )

    by_source: dict = {}
    for doc_id in got_surv:
        by_source.setdefault(got_surv[doc_id][0], []).append(doc_id)
    selected = []
    for s, ids in by_source.items():
        ids.sort(key=lambda i: (k60(i), i))
        selected.extend(ids[: quota[s]])
    assert len(selected) == target

    by_shard: dict = {}
    for doc_id in selected:
        by_shard.setdefault(
            k60(doc_id) // SHUFFLE_SHARD_WIDTH, []
        ).append(doc_id)
    want_manifest = set()
    for shard, ids in by_shard.items():
        ids.sort(key=lambda i: (k60(i), i))
        packs: dict = {}
        cum = 0
        for doc_id in ids:
            pid = cum // 2048
            n = got_surv[doc_id][1]
            nd, pt, fd, ld = packs.get(pid, (0, 0, doc_id, doc_id))
            packs[pid] = (
                nd + 1,
                pt + n,
                min(fd, doc_id),
                max(ld, doc_id),
            )
            cum += n
        for pid, (nd, pt, fd, ld) in packs.items():
            want_manifest.add((shard, pid, nd, pt, fd, ld))
    assert got_manifest == want_manifest


def test_curate_ingest_day_enforces_monotone_ids(spark, sf_dir):
    """An interleaved-id batch must raise, not silently produce
    decisions the full recompute would contradict."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.sources.tpch import load_table
    from iceberg_by_example_spark.streaming.quality import (
        batch_trained_filter,
    )

    old, day, _ = _curate_day_split(spark, sf_dir)
    w2, keep_micro = batch_trained_filter(spark, sf_dir)
    state = build_curate_state(spark, old, w2, keep_micro)
    with pytest.raises(ValueError, match="monotone-id"):
        pipeline_curate_ingest_day(spark, state, old.limit(5))
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="empty"):
        pipeline_curate_ingest_day(
            spark, state, docs.filter(F.col("doc_id") < 0)
        )


@pytest.mark.parametrize("materialize", ["disk", "manifest"])
def test_curate_corpus_materialize_variants_equal(
    spark, sf_dir, materialize
):
    """r13 VERDICT #6: the disk-backed cache and the written-manifest
    macro-stage boundary must produce the row-identical pack manifest
    to the default in-memory persist — the executable form of the
    'structure holds with the cache backed by disk' claim."""
    from iceberg_by_example_spark.operators.pipeline import (
        pipeline_curate_corpus,
    )

    base = {
        tuple(r) for r in pipeline_curate_corpus(spark, sf_dir).collect()
    }
    got = {
        tuple(r)
        for r in pipeline_curate_corpus(
            spark, sf_dir, materialize=materialize
        ).collect()
    }
    assert base and got == base


def test_curate_ingest_span_gate_drops_exactly_winnow_hits(
    spark, sf_dir
):
    """The opt-in verbatim-span gate (the probe triad's third leg):
    span-gated day survivors == default day survivors minus exactly
    the day docs ``incremental_winnow_pairs`` pairs with the standing
    winnow index — and the default-off path is untouched."""
    from iceberg_by_example_spark.operators.dedup import (
        incremental_winnow_pairs,
        winnow_keys,
    )
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.streaming.quality import (
        batch_trained_filter,
    )

    old, day, _ = _curate_day_split(spark, sf_dir)
    w2, keep_micro = batch_trained_filter(spark, sf_dir)
    state = build_curate_state(spark, old, w2, keep_micro)

    base = {
        r["doc_id"]
        for r in pipeline_curate_ingest_day(
            spark, state, day, return_survivors=True
        ).collect()
    }
    gated = {
        r["doc_id"]
        for r in pipeline_curate_ingest_day(
            spark, state, day, return_survivors=True, span_gate=True
        ).collect()
    }
    hits = {
        r["batch_doc"]
        for r in incremental_winnow_pairs(
            winnow_keys(day).select("doc_id", "k"),
            winnow_keys(old).select("doc_id", "k"),
        ).collect()
    }
    assert gated == base - hits
    assert gated <= base


def test_incremental_jaccard_bucketed_index_exchange_free(spark):
    """The near-dup postings probe inherits the winnow index's
    bucketed-table property (SCALING.md's incremental-curation
    section): materialize the standing shingle postings bucketed on
    the shingle hash, run incremental_jaccard_pairs against it with
    broadcast off, and assert the census and probe scans read
    Bucketed: true with NO corpus-side Exchange — only the O(batch)
    side and the pair agg shuffle. Results identical to the
    unbucketed path."""
    from iceberg_by_example_spark.operators.dedup import (
        incremental_jaccard_pairs,
        sized_shingle_postings,
        winnow_index_table,
    )

    docs = _planted_substring_corpus(spark)
    batch_ids = {7, 9, 5}
    batch = sized_shingle_postings(
        docs.filter(F.col("doc_id").isin(*batch_ids))
    )
    corpus = sized_shingle_postings(
        docs.filter(~F.col("doc_id").isin(*batch_ids))
    )

    idx = winnow_index_table(
        spark,
        corpus.select("doc_id", "n_sh", F.col("shingle").alias("k")),
        name="jidx_test",
    ).select("doc_id", "n_sh", F.col("k").alias("shingle"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = incremental_jaccard_pairs(batch, idx, min_jaccard=0.2)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        # census + probe + the hot-correction's hot-set/hot-array
        # derivations all scan the index. The probe/census scans must
        # read bucketed; scans that only feed a broadcast may have
        # bucketed reading disabled by DisableUnnecessaryBucketedScan
        # (no operator exploits the partitioning there) — harmless,
        # and the shuffle-free path check below covers them anyway.
        n_scans = sum(
            1
            for line in plan.splitlines()
            if "FileScan" in line and "jidx_test" in line
        )
        assert n_scans >= 2
        assert plan.count("Bucketed: true") >= 2  # census + probe
        paths = _scan_to_join_paths(plan, "jidx_test")
        assert len(paths) == n_scans
        # a BroadcastExchange of the df-capped HOT set is fine (it is
        # bounded by construction and deliberately hinted); the claim
        # under test is no SHUFFLE of the corpus-side postings
        for path in paths:
            assert not any(
                "Exchange hashpartitioning" in line for line in path
            ), (
                "corpus-side shuffle over the bucketed postings:\n"
                + "\n".join(path)
            )
        got = {
            (r["batch_doc"], r["corpus_doc"]): r["jaccard"]
            for r in pairs.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    want = {
        (r["batch_doc"], r["corpus_doc"]): r["jaccard"]
        for r in incremental_jaccard_pairs(
            batch, corpus, min_jaccard=0.2
        ).collect()
    }
    assert got == want
    assert got, "no probe hits — planted corpus should pair"


@pytest.mark.parametrize("span_gate", [False, True])
def test_curate_ingest_report_first_failure_accounting(
    spark, sf_dir, span_gate
):
    """The daily-ingest drop report: stage counts sum exactly to the
    batch, `kept` equals the survivor count from the decision path
    (same _ingest_gates — no drift possible), and each stage count
    matches a set-arithmetic recomputation from the gate relations in
    the ingest's first-failure order."""
    from iceberg_by_example_spark.operators.pipeline import (
        FUNNEL_MIN_STOP_RATIO,
        FUNNEL_MIN_TOKENS,
        FUNNEL_MIN_TTR,
        _funnel_metrics,
        _ingest_gates,
        build_curate_state,
        pipeline_curate_ingest_day,
        pipeline_curate_ingest_report,
    )
    from iceberg_by_example_spark.streaming.quality import (
        batch_trained_filter,
    )

    old, day, _ = _curate_day_split(spark, sf_dir)
    w2, keep_micro = batch_trained_filter(spark, sf_dir)
    state = build_curate_state(spark, old, w2, keep_micro)

    rows = {
        r["stage"]: (r["stage_idx"], r["n_docs"])
        for r in pipeline_curate_ingest_report(
            spark, state, day, span_gate=span_gate
        ).collect()
    }
    n_batch = day.count()
    assert sum(n for _, n in rows.values()) == n_batch
    surv_n = pipeline_curate_ingest_day(
        spark, state, day, return_survivors=True, span_gate=span_gate
    ).count()
    assert rows["kept"][1] == surv_n

    # set-arithmetic recomputation in the ingest's gate order.
    # Own the gates' candidate-pair cache locally (r15 ADVICE #4): the
    # persist from incremental_jaccard_pairs never self-reclaims, and
    # without a registry it would leak a CacheManager entry into the
    # shared test session — released in the finally below, matching
    # the production callers' ownership discipline.
    b = day.persist()
    gate_cache: list = []
    g = _ingest_gates(spark, state, b, span_gate, cache_registry=gate_cache)
    metrics = {
        r["doc_id"]: (r["n_tokens"], r["ttr"], r["stop_ratio"])
        for r in _funnel_metrics(b).collect()
    }
    ids = lambda df: {r["doc_id"] for r in df.collect()}  # noqa: E731
    exact_win = ids(g["exact_win"])
    nd = ids(g["nd_losers"])
    bench = ids(g["day_bench"])
    cont = ids(g["contaminated"])
    lr = ids(g["lr_keep"])
    span = ids(g["span_hits"]) if span_gate else set()
    want: dict = {}
    for doc_id, (nt, ttr, sr) in metrics.items():
        if nt < FUNNEL_MIN_TOKENS:
            st = "too_short"
        elif ttr < FUNNEL_MIN_TTR:
            st = "low_diversity"
        elif sr < FUNNEL_MIN_STOP_RATIO:
            st = "no_stopwords"
        elif doc_id not in exact_win:
            st = "exact_dup"
        elif doc_id in nd:
            st = "near_dup"
        elif doc_id in bench:
            st = "benchmark_slice"
        elif doc_id in cont:
            st = "contaminated"
        elif doc_id not in lr:
            st = "lr_rejected"
        elif doc_id in span:
            st = "span_hit"
        else:
            st = "kept"
        want[st] = want.get(st, 0) + 1
    b.unpersist()
    for df in gate_cache:
        df.unpersist()
    assert {s: n for s, (_, n) in rows.items()} == want
    # indices follow the gate order and kept is last
    assert rows["kept"][0] == max(i for i, _ in rows.values())


def test_incremental_jaccard_hot_correction_exact(spark):
    """r14 review fix: when the df cap binds, batch-vs-index Jaccard
    must still be EXACT for any pair sharing at least one capped
    shingle — the hot-shared shingles add back through the hot-array
    correction, exactly like the corpus-wide core. Crafted corpus:
    boilerplate 3-grams ('x y z', 'y z w') hot in the index (df 4 >
    cap 2); the batch doc is a verbatim copy of index doc 0, so the
    TRUE Jaccard is 1.0 — the uncorrected capped-vocabulary form
    reads 3/7 ≈ 0.43 and would MISS the pair at the 0.5 cluster
    threshold."""
    from iceberg_by_example_spark.operators.dedup import (
        incremental_jaccard_pairs,
        sized_shingle_postings,
    )

    def docs_df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    index_docs = docs_df(
        [
            (0, "a b q x y z w"),
            (1, "c d e x y z w"),
            (2, "f g h x y z w"),
            (3, "i j k x y z w"),
        ]
    )
    batch_docs = docs_df([(100, "a b q x y z w")])
    got = {
        (r["batch_doc"], r["corpus_doc"]): r["jaccard"]
        for r in incremental_jaccard_pairs(
            sized_shingle_postings(batch_docs),
            sized_shingle_postings(index_docs),
            df_cap=2,
            min_jaccard=0.5,
        ).collect()
    }
    assert got == {(100, 0): 1.0}

    # brute-force cross-check at a low threshold: every pair sharing
    # >= 1 capped shingle reports its exact set Jaccard
    def shingles(text):
        t = text.split(" ")
        return {
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        }

    idx_sh = {i: shingles(t) for i, t in [
        (0, "a b q x y z w"), (1, "c d e x y z w"),
        (2, "f g h x y z w"), (3, "i j k x y z w"),
    ]}
    b_sh = shingles("a b q x y z w")
    hot = {"x y z", "y z w"}
    got_low = {
        (r["batch_doc"], r["corpus_doc"]): r["jaccard"]
        for r in incremental_jaccard_pairs(
            sized_shingle_postings(batch_docs),
            sized_shingle_postings(index_docs),
            df_cap=2,
            min_jaccard=0.05,
        ).collect()
    }
    want_low = {}
    for i, sh in idx_sh.items():
        if not (b_sh & sh) - hot:
            continue  # no capped shared shingle -> not a candidate
        j = len(b_sh & sh) / len(b_sh | sh)
        if j >= 0.05:
            want_low[(100, i)] = j
    assert got_low == want_low
    assert want_low[(100, 0)] == 1.0


def test_curate_quota_randomized_battery_matches_python(spark):
    """Seeded random share distributions (caps binding and not, tiny
    and skewed sources, remainder ties): Spark's _curate_quota must
    equal the Python largest-remainder twin PER SOURCE every time —
    insurance against ordering/window edge bugs the hand-picked
    adversarial cases miss."""
    import random

    from iceberg_by_example_spark.operators.pipeline import (
        MIX_DOC_BUDGET_DEN,
        _curate_quota,
    )
    from iceberg_by_example_spark.operators.sampling import _mix_pow

    rng = random.Random(1414)
    for case in range(12):
        n_sources = rng.randint(1, 7)
        spec = {}
        for i in range(n_sources):
            nd = rng.randint(1, 12)
            tok = rng.choice([1, 3, 9, 50, 400, 10_000])
            spec[f"s{i}"] = (nd, tok)
        rows = []
        doc_id = 0
        for sname, (nd, tok) in spec.items():
            for _ in range(nd):
                rows.append((doc_id, sname, tok))
                doc_id += 1
        surv = spark.createDataFrame(
            rows, "doc_id long, source string, n_tokens long"
        )
        got = {
            r["source"]: r["quota"]
            for r in _curate_quota(surv).collect()
        }
        per_source = {s: (nd * tok, nd) for s, (nd, tok) in spec.items()}
        ps_df = spark.createDataFrame(
            [(s, t) for s, (t, _) in per_source.items()],
            "source string, source_tokens long",
        )
        pow_q = {
            r["source"]: int(r["pow_q"])
            for r in _mix_pow(ps_df).collect()
        }
        pow_tot = sum(pow_q.values())
        n = len(rows)
        target = (n + MIX_DOC_BUDGET_DEN - 1) // MIX_DOC_BUDGET_DEN
        want = _lr_quota_python(per_source, pow_q, pow_tot, target)
        assert got == want, (case, spec, got, want)


def test_advance_curate_state_equals_fresh_backfill(spark, sf_dir):
    """The daily state refresh must equal rebuilding from scratch:
    advance_curate_state(state over OLD, today's batch, today's
    survivors) produces relations set/value-identical to
    build_curate_state over OLD ∪ DAY with the same stored constants
    — every index, both censuses, the vocabulary, the source masses,
    and the watermark. THE closing pin of the incremental loop:
    tomorrow's ingest probes the advanced state exactly as a nightly
    rebuild would have it."""
    from iceberg_by_example_spark.operators.pipeline import (
        advance_curate_state,
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.sources.tpch import load_table
    from iceberg_by_example_spark.streaming.quality import (
        batch_trained_filter,
    )

    old, day, _ = _curate_day_split(spark, sf_dir)
    w2, keep_micro = batch_trained_filter(spark, sf_dir)
    state = build_curate_state(spark, old, w2, keep_micro)
    surv = pipeline_curate_ingest_day(
        spark, state, day, return_survivors=True
    )
    advanced = advance_curate_state(spark, state, day, surv)
    fresh = build_curate_state(
        spark, load_table(spark, sf_dir, "documents"), w2, keep_micro
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(advanced.fp_index) == rows(fresh.fp_index)
    assert rows(advanced.shingle_index) == rows(fresh.shingle_index)
    assert rows(advanced.shingle_census) == rows(fresh.shingle_census)
    assert rows(advanced.bench_vocab) == rows(fresh.bench_vocab)
    assert rows(advanced.winnow_index) == rows(fresh.winnow_index)
    assert rows(advanced.winnow_census) == rows(fresh.winnow_census)
    # guard the pin's precondition (r14 ADVICE #3): the source_stats
    # equality is data-contingent — a DAY benchmark-slice doc could
    # retroactively contaminate an OLD training doc in the fresh
    # recompute's UNION vocabulary, which the advanced state (OLD
    # decisions frozen at backfill) never revisits. Assert the
    # testdata has no such flip before pinning the masses.
    from iceberg_by_example_spark.operators.dedup import _shingle_sets
    from iceberg_by_example_spark.operators.pipeline import (
        DECON_BENCH_BUCKET,
        DECON_MIN_SHARED,
        _decon_hits,
    )
    from iceberg_by_example_spark.operators.sampling import hash_bucket

    old_sh = _shingle_sets(old).withColumn(
        "bucket", hash_bucket(F.col("doc_id"), "bench")
    )
    old_train = old_sh.filter(
        F.col("bucket") >= DECON_BENCH_BUCKET
    ).select("doc_id", F.explode("sh").alias("shingle"))
    day_vocab = (
        _shingle_sets(day)
        .filter(
            hash_bucket(F.col("doc_id"), "bench") < DECON_BENCH_BUCKET
        )
        .select(F.explode("sh").alias("shingle"))
        .distinct()
    )
    union_vocab = state.bench_vocab.unionByName(day_vocab).distinct()
    h_old = {
        r["doc_id"]: r["shared_grams"]
        for r in _decon_hits(old_train, state.bench_vocab).collect()
    }
    h_union = {
        r["doc_id"]: r["shared_grams"]
        for r in _decon_hits(old_train, union_vocab).collect()
    }
    flips = {
        d
        for d, s in h_union.items()
        if s >= DECON_MIN_SHARED and h_old.get(d, 0) < DECON_MIN_SHARED
    }
    assert flips == set(), (
        "testdata violates the no-retroactive-decontamination "
        f"precondition of the source_stats pin: {sorted(flips)[:5]}"
    )
    # source masses: advanced = old survivors + day survivors, which
    # equals the fresh chain's masses by the cross-slice theorem
    # (under the guard above)
    assert rows(advanced.source_stats) == rows(fresh.source_stats)
    assert advanced.max_doc_id == fresh.max_doc_id
    assert (advanced.w2, advanced.keep_micro) == (w2, keep_micro)


def test_ingest_report_gate_mismatch_raises_both_directions(spark):
    """r14 ADVICE #4: the gates/span_gate mismatch must fail FAST in
    BOTH directions. Gates built with span_gate=True reported with
    span_gate=False would silently attribute span-dropped docs to
    'kept'; the reverse direction was already guarded. Validation is
    pure input checking — it must precede any use of state or batch,
    which is why None stand-ins suffice here."""
    from iceberg_by_example_spark.operators.pipeline import (
        pipeline_curate_ingest_report,
    )

    sentinel = spark.range(0).select(F.col("id").alias("doc_id"))
    base = dict(
        heur=None, exact_win=None, nd_losers=None, day_bench=None,
        contaminated=None, lr_keep=None,
    )
    with pytest.raises(ValueError, match="span_gate=True"):
        pipeline_curate_ingest_report(
            spark, None, None, span_gate=True,
            gates={**base, "span_hits": None},
        )
    with pytest.raises(ValueError, match="misattributed"):
        pipeline_curate_ingest_report(
            spark, None, None, span_gate=False,
            gates={**base, "span_hits": sentinel},
        )


def test_ensure_curate_state_invalidated_by_corpus_mutation(
    spark, sf_dir, tmp_path
):
    """r14 ADVICE #5: the on-disk standing-state cache must key on the
    documents table's CONTENT, not just its path — regenerated
    testdata at the same path previously served a stale index into
    timed bench passes. Copy the corpus to a scratch dir, build the
    state, shrink the corpus in place, and assert the next ensure
    call rebuilds (watermark drops with the corpus)."""
    import shutil

    from iceberg_by_example_spark.operators.pipeline import (
        _curate_state_root,
        ensure_curate_state,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    import os

    scratch = str(tmp_path / "sfmut")
    os.makedirs(scratch)
    shutil.copy(
        f"{sf_dir}/documents.parquet", f"{scratch}/documents.parquet"
    )
    try:
        state1, t1 = ensure_curate_state(spark, scratch)
        max1 = state1.max_doc_id

        docs = load_table(spark, scratch, "documents")
        cut = int(
            docs.agg(
                F.expr("CAST(percentile(doc_id, 0.5) AS BIGINT)")
            ).collect()[0][0]
        )
        half = docs.filter(F.col("doc_id") < cut).collect()
        os.remove(f"{scratch}/documents.parquet")
        spark.createDataFrame(half, docs.schema).write.parquet(
            f"{scratch}/documents.parquet"
        )

        state2, t2 = ensure_curate_state(spark, scratch)
        assert state2.max_doc_id < max1  # rebuilt over the shrunk corpus
    finally:
        shutil.rmtree(_curate_state_root(scratch), ignore_errors=True)


def test_advance_census_merge_paths_equal(spark):
    """r14 ADVICE #2 / VERDICT #5: the census delta-merge must be
    identical through the broadcast path (map-side split on the delta
    keys — the default) and the shuffle fallback (the documented path
    for a day whose distinct keys exceed the broadcast threshold), and
    both must equal a census recomputed from scratch over OLD ∪ DAY
    postings."""
    from iceberg_by_example_spark.operators.dedup import (
        sized_shingle_postings,
    )
    from iceberg_by_example_spark.operators.pipeline import (
        advance_curate_state,
        build_curate_state,
    )

    def docs_df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string").select(
            "doc_id", "text", F.lit("web").alias("source")
        )

    old_docs = docs_df(
        [
            (0, "a b c d e f g h"),
            (1, "a b c d x y z w"),
            (2, "p q r s t u v n"),
        ]
    )
    surv = spark.createDataFrame(
        [(0, "web", 8)], "doc_id long, source string, n_tokens long"
    )
    state = build_curate_state(
        spark, old_docs, w2=[0], keep_micro=0, survivors=surv
    )
    batch = docs_df(
        [
            (10, "a b c d e f g q"),  # overlaps old shingles
            (11, "m n o p a a b b"),  # mostly fresh shingles
        ]
    )
    day_surv = spark.createDataFrame(
        [(10, "web", 8)], "doc_id long, source string, n_tokens long"
    )

    def census_rows(st):
        return sorted(map(tuple, st.shingle_census.collect()))

    adv_b = advance_curate_state(
        spark, state, batch, day_surv, broadcast_census_delta=True
    )
    adv_s = advance_curate_state(
        spark, state, batch, day_surv, broadcast_census_delta=False
    )
    want = sorted(
        map(
            tuple,
            sized_shingle_postings(old_docs.unionByName(batch))
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .collect(),
        )
    )
    assert census_rows(adv_b) == want
    assert census_rows(adv_s) == want
    # the winnow census merges through the same code path
    wb = sorted(map(tuple, adv_b.winnow_census.collect()))
    ws = sorted(map(tuple, adv_s.winnow_census.collect()))
    assert wb == ws


def test_incremental_jaccard_candidate_paths_equal(spark):
    """r14 ADVICE #1: dropping the candidate-set broadcast hint (the
    fallback for a batch too large to broadcast its candidates) must
    not change a single pair or Jaccard value."""
    from iceberg_by_example_spark.operators.dedup import (
        incremental_jaccard_pairs,
        sized_shingle_postings,
    )

    def docs_df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    index_docs = docs_df(
        [
            (0, "a b q x y z w"),
            (1, "c d e x y z w"),
            (2, "f g h x y z w"),
            (3, "i j k x y z w"),
        ]
    )
    batch_docs = docs_df([(100, "a b q x y z w"), (101, "c d e x y q w")])

    def pairs(broadcast_candidates):
        return {
            (r["batch_doc"], r["corpus_doc"]): r["jaccard"]
            for r in incremental_jaccard_pairs(
                sized_shingle_postings(batch_docs),
                sized_shingle_postings(index_docs),
                df_cap=2,
                min_jaccard=0.05,
                broadcast_candidates=broadcast_candidates,
            ).collect()
        }

    got_b, got_s = pairs(True), pairs(False)
    assert got_b == got_s
    assert got_b  # non-vacuous: the crafted corpus produces pairs


def test_ingest_decon_vocab_bucketed_equality_and_guard(spark, sf_dir):
    """r15 verdict #6 — the decon gate's broadcast is boundable two
    ways: ``decon_vocab_buckets=2**k`` hashes both sides into a fixed
    2^k-bucket model (the DSIR trick) whose flagged set equals the
    exact form at 2^20 buckets (collision mass negligible at test
    scale, and collisions could only ADD flags — the safe direction);
    ``decon_vocab_max_broadcast=N`` fails loudly when the
    fixed-size-eval-suite contract no longer holds, instead of
    handing an oversized broadcast to the session."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.streaming.quality import (
        batch_trained_filter,
    )

    old, day, _ = _curate_day_split(spark, sf_dir)
    w2, keep_micro = batch_trained_filter(spark, sf_dir)
    state = build_curate_state(spark, old, w2, keep_micro)

    def surv_ids(**kw):
        return {
            r["doc_id"]
            for r in pipeline_curate_ingest_day(
                spark, state, day, return_survivors=True, **kw
            )
            .select("doc_id")
            .collect()
        }

    exact = surv_ids()
    assert surv_ids(decon_vocab_buckets=1 << 20) == exact
    # the guard passes while the contract holds …
    assert surv_ids(decon_vocab_max_broadcast=10_000_000) == exact
    # … and fails loudly (before any broadcast) when it doesn't
    with pytest.raises(ValueError, match="fixed-size-eval-suite"):
        pipeline_curate_ingest_day(
            spark,
            state,
            day,
            return_survivors=True,
            decon_vocab_max_broadcast=1,
        )


@pytest.mark.slow
def test_ingest_decon_vocab_bucketed_equality_sf01(spark):
    """r16 verdict #6 — the flip precondition MEASURED at bench scale
    (sf0.1): the 2^20-bucket decon model is NOT decision-equal to the
    exact form there (one extra flagged doc — a non-vocab shingle
    landing in a vocab bucket), so the registered/bench form stays
    EXACT per the verdict's own condition and the bucketed form stays
    the production knob. What IS pinned at scale is the knob's safety
    contract: bucketed survivors ⊆ exact survivors (collisions only
    ADD contamination flags — the full-width-hash count in the gate
    makes the never-miss direction structural, not probabilistic) and
    the over-flag mass is a handful of docs out of thousands."""
    from iceberg_by_example_spark.operators.pipeline import (
        ensure_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    sf = "/root/testdata/sf0.1"
    state, t = ensure_curate_state(spark, sf)
    batch = load_table(spark, sf, "documents").filter(
        F.col("doc_id") >= t
    )

    def surv_ids(**kw):
        return {
            r["doc_id"]
            for r in pipeline_curate_ingest_day(
                spark, state, batch, return_survivors=True, **kw
            )
            .select("doc_id")
            .collect()
        }

    exact = surv_ids()
    bucketed = surv_ids(decon_vocab_buckets=1 << 20)
    assert bucketed <= exact  # never a missed flag, only extra ones
    assert len(exact - bucketed) <= max(2, len(exact) // 1000)


def test_hashing_logit_micro_equals_feature_dot(spark, sf_dir):
    """The scorer's direct w·x fold (hashing_logit_micro) must equal
    the trainer's count-vector dot bit-for-bit — the no-drift pin for
    the r20 scorer restructure (z = Σ_tokens w[bucket(t)] by
    distributivity over the SAME token→bucket mapping)."""
    from iceberg_by_example_spark.operators.text import (
        HASHING_DIM,
        hashing_feature_frame,
        hashing_logit_micro,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents")
    # deterministic non-trivial weights, including negatives
    w = [((7 * k + 3) % 41) - 20 for k in range(HASHING_DIM)]
    w_arr = F.array(*[F.lit(int(v)).cast("long") for v in w])
    dot = F.aggregate(
        F.zip_with("features", "w", lambda f, wv: f * wv),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    want = {
        r["doc_id"]: r["z"]
        for r in hashing_feature_frame(docs)
        .withColumn("w", w_arr)
        .select("doc_id", dot.alias("z"))
        .collect()
    }
    got = {
        r["doc_id"]: r["z"]
        for r in hashing_logit_micro(docs, w).collect()
    }
    assert got == want
