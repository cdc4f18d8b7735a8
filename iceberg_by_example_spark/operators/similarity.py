"""Similarity search over the ``embeddings`` table (north-star
extension): brute-force cosine top-k as the verified baseline, and a
random-hyperplane (sign) LSH bucketing as the scale path.

Cross-engine determinism trick: cosine over *quantized integers*.
Each float component is mapped to ``FLOOR(x * 1e6)`` (exact: float to
double is lossless, the product is one IEEE op, FLOOR is exact), so
dot products and norms are exact 64-bit integer sums — order-
independent and bit-identical in Spark and DuckDB. The final
``dot / (sqrt(na) * sqrt(nb))`` is computed from identical integers,
giving identical doubles. Quantization error (~1e-6 relative) is far
below any meaningful similarity delta.

Everything is built-in column expressions (zip_with/aggregate inside
codegen); no Python crosses the row path.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table

QUANT = 1_000_000  # |x| < 0.53 in this corpus → products stay << 2^53


def _qdot(a, b) -> Column:
    """Exact integer dot product of two quantized float arrays.

    The float component is cast to double *before* scaling: Spark
    would otherwise multiply in float precision while DuckDB promotes
    to double, giving different FLOOR results.

    Twin: ``LIST_SUM(LIST_TRANSFORM(LIST_ZIP(a, b), s ->
    CAST(FLOOR(CAST(s[1] AS DOUBLE)*1e6) AS BIGINT) *
    CAST(FLOOR(CAST(s[2] AS DOUBLE)*1e6) AS BIGINT)))``
    """
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(x.cast("double") * QUANT)
        * F.floor(y.cast("double") * QUANT),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def _qnorm2(a) -> Column:
    """Exact integer squared norm of a quantized float array."""
    return _qdot(a, a)


def _cosine(dot: Column, n2a: Column, n2b: Column) -> Column:
    return dot.cast("double") / (
        F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double"))
    )


_DOT_SQL = (
    "LIST_SUM(LIST_TRANSFORM(LIST_ZIP({a}, {b}), "
    "s -> CAST(FLOOR(CAST(s[1] AS DOUBLE)*1000000) AS BIGINT)"
    " * CAST(FLOOR(CAST(s[2] AS DOUBLE)*1000000) AS BIGINT)))"
)


@register(
    "sim_topk_cosine",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, e.label,
             CAST({_DOT_SQL.format(a='e.embedding', b='q.qe')} AS DOUBLE)
               / (SQRT(CAST({_DOT_SQL.format(a='e.embedding', b='e.embedding')} AS DOUBLE))
                  * SQRT(CAST({_DOT_SQL.format(a='q.qe', b='q.qe')} AS DOUBLE))) AS cosine
      FROM embeddings e, q
      WHERE e.vec_id != 0)
    SELECT vec_id, label, cosine FROM scored
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    category="similarity",
    bench=True,
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for one query vector (vec_id=0): the
    exact ANN baseline. The 1-row query side broadcasts; the corpus
    scan is embarrassingly parallel; TakeOrderedAndProject keeps only
    k rows per partition. Per-query cost is O(n·d) — the LSH/IVF
    variants below are the 100 TB path."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    scored = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        _cosine(
            _qdot(F.col("embedding"), F.col("qe")),
            _qnorm2(F.col("embedding")),
            _qnorm2(F.col("qe")),
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(10)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding,
             {_DOT_SQL.format(a='embedding', b='embedding')} AS n2
      FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST({_DOT_SQL.format(a='a.embedding', b='b.embedding')} AS DOUBLE)
             / (SQRT(CAST(a.n2 AS DOUBLE)) * SQRT(CAST(b.n2 AS DOUBLE))) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE CAST({_DOT_SQL.format(a='a.embedding', b='b.embedding')} AS DOUBLE)
            / (SQRT(CAST(a.n2 AS DOUBLE)) * SQRT(CAST(b.n2 AS DOUBLE))) >= 0.35
    """,
    category="dedup",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs by exact cosine ≥ 0.35 — the
    all-pairs *verification* operator. O(n²) by nature, so at scale it
    runs only on LSH candidates (sim_lsh_buckets); here it doubles as
    the oracle-checkable exact reference."""
    e = load_table(spark, sf_dir, "embeddings")
    n = e.select("vec_id", "embedding", _qnorm2(F.col("embedding")).alias("n2"))
    a, b = n.alias("a"), n.alias("b")
    cos = _cosine(
        _qdot(F.col("a.embedding"), F.col("b.embedding")),
        F.col("a.n2"),
        F.col("b.n2"),
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.35)
    )


@register(
    "embed_normalize",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, label, embedding,
             {_DOT_SQL.format(a='embedding', b='embedding')} AS n2
      FROM embeddings)
    SELECT vec_id, label,
           ROUND(CAST(embedding[1] AS DOUBLE) / SQRT(CAST(n2 AS DOUBLE) / 1e12), 6)
             AS unit_first,
           ROUND(CAST(embedding[64] AS DOUBLE) / SQRT(CAST(n2 AS DOUBLE) / 1e12), 6)
             AS unit_last,
           ROUND(SQRT(CAST(n2 AS DOUBLE) / 1e12), 6) AS l2_norm
    FROM n
    """,
    category="similarity",
)
def embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-normalization (the preprocessing step before any cosine
    index): L2 norm from the exact quantized dot product, spot-checking
    the first/last normalized components. (The quantized n2 is scaled
    by QUANT² — divide out before the sqrt.)"""
    e = load_table(spark, sf_dir, "embeddings")
    n2 = _qnorm2(F.col("embedding"))
    norm = F.sqrt(n2.cast("double") / F.lit(float(QUANT) * QUANT))
    return e.select(
        "vec_id",
        "label",
        F.round(F.element_at("embedding", 1).cast("double") / norm, 6).alias(
            "unit_first"
        ),
        F.round(F.element_at("embedding", 64).cast("double") / norm, 6).alias(
            "unit_last"
        ),
        F.round(norm, 6).alias("l2_norm"),
    )


@register(
    "embed_label_centroids",
    oracle="""
    WITH exploded AS (
      SELECT label,
             GENERATE_SUBSCRIPTS(embedding, 1) AS pos,
             UNNEST(embedding) AS val
      FROM embeddings)
    SELECT label, pos,
           CAST(SUM(CAST(FLOOR(CAST(val AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
             / 1000000.0 / COUNT(*) AS centroid_val
    FROM exploded
    WHERE pos <= 4
    GROUP BY label, pos
    """,
    category="similarity",
)
def embed_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids (mean vector), computed by exploding
    (label, pos, val) and aggregating exact quantized sums per
    dimension — the distributed way to average vectors without a
    Python loop, shown for the first 4 dims (oracle-hashable)."""
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode("embedding").alias("pos0", "val")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("val").cast("double") * QUANT).alias("qval"),
    )
    return (
        exploded.filter(F.col("pos") <= 4)
        .groupBy("label", "pos")
        .agg(
            (
                F.sum("qval").cast("double") / F.lit(float(QUANT)) / F.count("*")
            ).alias("centroid_val")
        )
    )


# ---------------------------------------------------------------------------
# Sign-LSH bucketing (the ANN scale path) — deterministic hyperplanes
# ---------------------------------------------------------------------------

N_PLANES = 8
DIM = 64


def _planes() -> list[list[int]]:
    """N_PLANES pseudo-random ±1 hyperplanes from a fixed seed. The
    same literals are embedded in the oracle SQL, so bucket ids match
    across engines exactly."""
    rng = random.Random(42)
    return [[rng.choice((-1, 1)) for _ in range(DIM)] for _ in range(N_PLANES)]


PLANES = _planes()


def _bucket_expr(emb) -> Column:
    """LSH bucket id: bit j = sign of the quantized dot with plane j."""
    bucket = F.lit(0)
    for j, plane in enumerate(PLANES):
        w = F.array(*[F.lit(v) for v in plane])
        dot = F.aggregate(
            F.zip_with(
                emb,
                w,
                lambda x, s: F.floor(x.cast("double") * QUANT) * s.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def _bucket_sql(emb: str) -> str:
    terms = []
    for j, plane in enumerate(PLANES):
        w = "[" + ", ".join(str(v) for v in plane) + "]"
        dot = (
            f"LIST_SUM(LIST_TRANSFORM(LIST_ZIP({emb}, {w}), "
            f"s -> CAST(FLOOR(CAST(s[1] AS DOUBLE)*{QUANT}) AS BIGINT)"
            f" * CAST(s[2] AS BIGINT)))"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)


@register(
    "sim_lsh_buckets",
    oracle=f"""
    WITH bucketed AS (
      SELECT vec_id, label, {_bucket_sql('embedding')} AS bucket
      FROM embeddings)
    SELECT bucket, COUNT(*) AS n_vectors,
           MIN(vec_id) AS min_vec_id, MAX(vec_id) AS max_vec_id
    FROM bucketed GROUP BY bucket
    """,
    category="similarity",
)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment — the ANN scale path.
    8 sign bits → 256 buckets; a query probes only its bucket
    (plus neighbors for recall), cutting candidate sets ~256×. The
    hyperplanes are seed-derived literals, so assignment is
    reproducible anywhere (and oracle-checkable)."""
    e = load_table(spark, sf_dir, "embeddings")
    bucketed = e.select(
        "vec_id", "label", _bucket_expr(F.col("embedding")).alias("bucket")
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").alias("n_vectors"),
        F.min("vec_id").alias("min_vec_id"),
        F.max("vec_id").alias("max_vec_id"),
    )


def sim_ivf_topk_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans-trained IVF ANN — the production variant (data-adapted
    cells beat fixed ones on recall). Unregistered because KMeans init
    isn't cross-engine reproducible; the registered ``sim_ivf_topk``
    below swaps in seed-derived centroids so the whole path
    oracle-checks, and pytest pins both variants' scores to brute
    force."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    K, NPROBE = 16, 4
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(k=K, seed=42, featuresCol="features").fit(e)
    assigned = model.transform(e).select(
        "vec_id", "embedding", F.col("prediction").alias("cell")
    )

    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    q = assigned.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    # rank cells by centroid distance to the query, keep NPROBE
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .select(
            "cell",
            _qdot(F.col("centroid"), F.col("qe")).alias("cdot"),
            _qnorm2(F.col("centroid")).alias("cn2"),
            _qnorm2(F.col("qe")).alias("qn2"),
        )
        .select("cell", _cosine(F.col("cdot"), F.col("cn2"), F.col("qn2")).alias("csim"))
        .orderBy(F.desc("csim"))
        .limit(NPROBE)
        .select("cell")
    )
    cands = assigned.join(F.broadcast(probe_cells), "cell").filter(
        F.col("vec_id") != 0
    )
    scored = cands.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.col("cell").cast("long").alias("cell"),
        _cosine(
            _qdot(F.col("embedding"), F.col("qe")),
            _qnorm2(F.col("embedding")),
            _qnorm2(F.col("qe")),
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(10)


# --- deterministic IVF: seed-derived fixed centroids ------------------
# Same idiom as the JL ±1 matrix and the LSH planes: the "trained"
# coarse quantizer is replaced by centroids generated from a fixed seed
# directly in the quantized integer domain, so cell assignment is a
# pure integer expression both engines evaluate bit-identically.
IVF_K = 16
IVF_NPROBE = 4


def _ivf_centroids() -> list[list[int]]:
    """K centroids × DIM components, integers in quantized units
    (±0.3 in float terms — inside this corpus's |x| < 0.53 range)."""
    rng = random.Random(99)
    return [
        [rng.randint(-300_000, 300_000) for _ in range(DIM)]
        for _ in range(IVF_K)
    ]


IVF_CENTROIDS = _ivf_centroids()


def _ivf_key(emb, k: int) -> Column:
    """Squared L2 distance (quantized ints) to centroid k, tie-broken
    injectively: key = dist2 * K + k, so LEAST picks the nearest cell
    and ties resolve to the lowest k. Bounds: per-component diff ≤
    830k → dist2 ≤ 64·6.9e11 ≈ 4.4e13; ×16 ≈ 7e14 ≪ 2^63."""
    c = F.array(*[F.lit(v) for v in IVF_CENTROIDS[k]])
    d2 = F.aggregate(
        F.zip_with(
            emb,
            c,
            lambda x, cv: (F.floor(x.cast("double") * QUANT) - cv)
            * (F.floor(x.cast("double") * QUANT) - cv),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return d2 * IVF_K + F.lit(k)


def _ivf_key_sql(emb: str, k: int) -> str:
    c = "[" + ", ".join(str(v) for v in IVF_CENTROIDS[k]) + "]"
    diff = (
        f"(CAST(FLOOR(CAST(s[1] AS DOUBLE)*{QUANT}) AS BIGINT)"
        f" - CAST(s[2] AS BIGINT))"
    )
    # CAST: LIST_SUM yields HUGEINT, which pandas converts to float64
    # and the driver's canonical hash then sees 'f:15.0' vs 'i:15'
    # (the round-3 failure class) — pin the key to BIGINT.
    return (
        f"CAST((LIST_SUM(LIST_TRANSFORM(LIST_ZIP({emb}, {c}), "
        f"s -> {diff} * {diff})) * {IVF_K} + {k}) AS BIGINT)"
    )


def _ivf_keys_sql(emb: str) -> str:
    return "[" + ", ".join(_ivf_key_sql(emb, k) for k in range(IVF_K)) + "]"


@register(
    "sim_ivf_topk",
    oracle=f"""
    WITH assigned AS (
      SELECT vec_id, embedding,
             LIST_MIN({_ivf_keys_sql('embedding')}) % {IVF_K} AS cell
      FROM embeddings),
    q AS (
      SELECT embedding AS qe,
             LIST_TRANSFORM(
               LIST_SORT({_ivf_keys_sql('embedding')})[1:{IVF_NPROBE}],
               x -> x % {IVF_K}) AS probe_cells
      FROM embeddings WHERE vec_id = 0),
    cands AS (
      SELECT a.vec_id, a.cell, a.embedding, q.qe
      FROM assigned a, q
      WHERE LIST_CONTAINS(q.probe_cells, a.cell) AND a.vec_id != 0)
    SELECT vec_id, cell,
           CAST({_DOT_SQL.format(a='embedding', b='qe')} AS DOUBLE)
             / (SQRT(CAST({_DOT_SQL.format(a='embedding', b='embedding')} AS DOUBLE))
                * SQRT(CAST({_DOT_SQL.format(a='qe', b='qe')} AS DOUBLE))) AS cosine
    FROM cands
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    category="similarity",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: the corpus is partitioned into K cells
    by nearest coarse centroid; a query scores only the ``IVF_NPROBE``
    cells whose centroids are nearest — the index shape behind
    FAISS-style ANN as a plain DataFrame pipeline. Centroids are
    seed-derived integer literals (``_ivf_centroids``), which makes
    the full path — assignment, probe selection, scoring —
    bit-reproducible in DuckDB; ``sim_ivf_topk_kmeans`` above is the
    trained variant for production recall.

    Scale: assignment is a pure map (K distance expressions inside
    whole-stage codegen, no shuffle, no model broadcast — any executor
    regenerates the centroids from the seed); the probe semi-joins a
    1-row broadcast and reads ~NPROBE/K of the corpus."""
    e = load_table(spark, sf_dir, "embeddings")
    keys = F.array(
        *[_ivf_key(F.col("embedding"), k) for k in range(IVF_K)]
    )
    assigned = e.select(
        "vec_id",
        "embedding",
        (F.array_min(keys) % IVF_K).alias("cell"),
    )
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"),
        F.transform(
            F.slice(F.array_sort(keys), 1, IVF_NPROBE),
            lambda x: x % IVF_K,
        ).alias("probe_cells"),
    )
    cands = assigned.crossJoin(F.broadcast(q)).filter(
        F.array_contains(F.col("probe_cells"), F.col("cell"))
        & (F.col("vec_id") != 0)
    )
    scored = cands.select(
        "vec_id",
        "cell",
        _cosine(
            _qdot(F.col("embedding"), F.col("qe")),
            _qnorm2(F.col("embedding")),
            _qnorm2(F.col("qe")),
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(10)


@register(
    "sim_lsh_ann_topk",
    # Every stage is deterministic — seed-literal hyperplanes, quantized
    # dots — so even the APPROXIMATE path oracle-checks end-to-end.
    oracle=f"""
    WITH bucketed AS (
      SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
      FROM embeddings),
    q AS (SELECT embedding AS qe, bucket AS qbucket
          FROM bucketed WHERE vec_id = 0),
    cands AS (
      SELECT b.vec_id, b.embedding, q.qe
      FROM bucketed b, q
      WHERE b.bucket = q.qbucket AND b.vec_id != 0)
    SELECT vec_id,
           CAST({_DOT_SQL.format(a='embedding', b='qe')} AS DOUBLE)
             / (SQRT(CAST({_DOT_SQL.format(a='embedding', b='embedding')} AS DOUBLE))
                * SQRT(CAST({_DOT_SQL.format(a='qe', b='qe')} AS DOUBLE))) AS cosine
    FROM cands
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    category="similarity",
    bench=True,
)
def sim_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: score the query only against its LSH bucket's
    members — the per-query cost drops from O(n) to O(n / buckets).
    Returns (vec_id, cosine) for the query's bucket, top-10."""
    e = load_table(spark, sf_dir, "embeddings")
    bucketed = e.select(
        "vec_id", "embedding", _bucket_expr(F.col("embedding")).alias("bucket")
    )
    q = bucketed.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), F.col("bucket").alias("qbucket")
    )
    cands = bucketed.join(
        F.broadcast(q), F.col("bucket") == F.col("qbucket")
    ).filter(F.col("vec_id") != 0)
    scored = cands.select(
        "vec_id",
        _cosine(
            _qdot(F.col("embedding"), F.col("qe")),
            _qnorm2(F.col("embedding")),
            _qnorm2(F.col("qe")),
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(10)


BATCH_TOPK_NQ = 10  # query-batch size
BATCH_TOPK_K = 3


@register(
    "sim_batch_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qe FROM embeddings
      WHERE vec_id < {BATCH_TOPK_NQ}),
    scored AS (
      SELECT q.qid, e.vec_id,
             CAST({_DOT_SQL.format(a='e.embedding', b='q.qe')} AS DOUBLE)
               / (SQRT(CAST({_DOT_SQL.format(a='e.embedding', b='e.embedding')} AS DOUBLE))
                  * SQRT(CAST({_DOT_SQL.format(a='q.qe', b='q.qe')} AS DOUBLE))) AS cosine
      FROM embeddings e, q
      WHERE e.vec_id >= {BATCH_TOPK_NQ}),
    ranked AS (
      SELECT qid, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, vec_id) AS rk
      FROM scored)
    SELECT qid, vec_id, cosine, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {BATCH_TOPK_K}
    """,
    category="similarity",
    bench=True,
)
def sim_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED top-k: {BATCH_TOPK_NQ} query vectors answered in ONE
    corpus pass — the offline / re-indexing shape (scoring a benchmark
    suite, re-linking a day's new embeddings), where per-query
    ``sim_topk_cosine`` would rescan the corpus per query. The query
    batch broadcasts; each corpus partition scores all queries
    locally; a per-query window keeps k.

    Scale shape: one corpus scan regardless of batch size; the shuffle
    carries only the (qid, candidate, score) rows that survive — with
    WindowGroupLimit Spark pre-prunes to k per query per partition
    before the exchange, so the exchange is O(batch × k × partitions),
    corpus-size-independent. For huge batches, compose with the LSH/
    IVF bucketing above so each query scores only its probe cells."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < BATCH_TOPK_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    scored = (
        e.filter(F.col("vec_id") >= BATCH_TOPK_NQ)
        .crossJoin(F.broadcast(q))
        .select(
            "qid",
            "vec_id",
            _cosine(
                _qdot(F.col("embedding"), F.col("qe")),
                _qnorm2(F.col("embedding")),
                _qnorm2(F.col("qe")),
            ).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= BATCH_TOPK_K)
        .select("qid", "vec_id", "cosine", "rk")
    )


def _sq8_encoded(e: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 quantization (scale = absmax/127,
    q = clamp(FLOOR(x/scale + 0.5))) carrying the original embedding
    alongside — the shared encode behind the registered
    ``embed_quantize_int8`` stats AND the ``sim_sq8_topk`` coded
    search (cosine is invariant to the per-vector scalar, so code
    cosine approximates true cosine directly).

    Rounding is ``FLOOR(x/scale + 0.5)`` — identical in every engine,
    unlike ROUND whose half-even/half-away convention differs. An
    all-zero embedding has scale 0; x/0 is NaN and floor(NaN) renders
    differently across engines, so it quantizes to the all-zero int
    vector explicitly (matching the oracle CASE)."""
    scale = (
        F.array_max(
            F.transform("embedding", lambda x: F.abs(x.cast("double")))
        )
        / 127
    )
    qv = F.transform(
        "embedding",
        lambda x: F.when(
            F.col("scale") == 0, F.lit(0).cast("long")
        ).otherwise(
            F.greatest(
                F.lit(-127).cast("long"),
                F.least(
                    F.lit(127).cast("long"),
                    F.floor(x.cast("double") / F.col("scale") + 0.5),
                ),
            )
        ),
    )
    return e.select(
        "vec_id", "label", "embedding", scale.alias("scale")
    ).select("vec_id", "label", "embedding", "scale", qv.alias("qv"))


@register(
    "embed_quantize_int8",
    oracle="""
    WITH scaled AS (
      SELECT vec_id, label,
             LIST_MAX(LIST_TRANSFORM(embedding,
                 x -> ABS(CAST(x AS DOUBLE)))) / 127 AS scale
      FROM embeddings),
    q AS (
      SELECT s.vec_id, s.label, s.scale,
             LIST_TRANSFORM(e.embedding,
               x -> CASE WHEN s.scale = 0 THEN CAST(0 AS BIGINT)
                    ELSE GREATEST(-127, LEAST(127,
                      CAST(FLOOR(CAST(x AS DOUBLE) / s.scale + 0.5)
                           AS BIGINT))) END)
               AS qv
      FROM scaled s JOIN embeddings e USING (vec_id))
    SELECT vec_id, label, scale,
           -- CAST: DuckDB LIST_SUM over integers yields HUGEINT, which
           -- the driver's pandas hasher renders float64 and mismatches
           -- Spark's BIGINT on value-identical results.
           CAST(LIST_SUM(qv) AS BIGINT) AS q_sum,
           CAST(LIST_SUM(LIST_TRANSFORM(qv, v -> ABS(v))) AS BIGINT)
             AS q_l1,
           LEN(LIST_FILTER(qv, v -> ABS(v) = 127)) AS n_saturated
    FROM q
    """,
    category="similarity",
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    compression step an ANN index runs before storing vectors (4×
    smaller, SIMD-friendly integer dot products downstream). Per-vector
    absmax scaling: scale = max|x|/127, q = clamp(round(x/scale)).

    Rounding is ``FLOOR(x/scale + 0.5)`` — identical in every engine,
    unlike ROUND whose half-even/half-away convention differs. The
    reported aggregates (component sum, L1 mass, saturation count) are
    pure integers, so the oracle match is exact; ``scale`` is a single
    max-reduce (order-independent double). One narrow map stage, no
    shuffle, no UDF."""
    return _sq8_encoded(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "label",
        "scale",
        F.aggregate(
            "qv", F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("q_sum"),
        F.aggregate(
            "qv", F.lit(0).cast("long"), lambda acc, v: acc + F.abs(v)
        ).alias("q_l1"),
        F.size(F.filter("qv", lambda v: F.abs(v) == 127)).alias(
            "n_saturated"
        ),
    )


# --- SQ8 coded search: coarse int8 scan + exact refine ----------------

SQ8_SHORTLIST = 50  # code-space candidates the exact re-rank touches
SQ8_K = 10

_CDOT_SQL = (
    "CAST(LIST_SUM(LIST_TRANSFORM(LIST_ZIP({a}, {b}), "
    "z -> z[1] * z[2])) AS BIGINT)"
)

_SQ8_ENC_SQL = """
    scaled AS (
      SELECT vec_id, label, embedding,
             LIST_MAX(LIST_TRANSFORM(embedding,
                 x -> ABS(CAST(x AS DOUBLE)))) / 127 AS scale
      FROM embeddings),
    enc AS (
      SELECT vec_id, label, embedding,
             LIST_TRANSFORM(embedding,
               x -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
                    ELSE GREATEST(-127, LEAST(127,
                      CAST(FLOOR(CAST(x AS DOUBLE) / scale + 0.5)
                           AS BIGINT))) END)
               AS qv
      FROM scaled)
"""

_SQ8_ORACLE = f"""
    WITH {_SQ8_ENC_SQL},
    q AS (SELECT qv AS qc, embedding AS qe FROM enc WHERE vec_id = 0),
    coarse AS (
      SELECT e.vec_id, e.label, e.embedding, q.qe,
             CAST({_CDOT_SQL.format(a='e.qv', b='q.qc')} AS DOUBLE)
               / (SQRT(CAST({_CDOT_SQL.format(a='e.qv', b='e.qv')}
                            AS DOUBLE))
                  * SQRT(CAST({_CDOT_SQL.format(a='q.qc', b='q.qc')}
                              AS DOUBLE))) AS code_cos
      FROM enc e, q
      WHERE e.vec_id != 0
        AND {_CDOT_SQL.format(a='e.qv', b='e.qv')} > 0
      ORDER BY code_cos DESC, e.vec_id LIMIT {SQ8_SHORTLIST}),
    refined AS (
      SELECT vec_id, label, code_cos,
             CAST({_DOT_SQL.format(a='embedding', b='qe')} AS DOUBLE)
               / (SQRT(CAST({_DOT_SQL.format(a='embedding', b='embedding')}
                            AS DOUBLE))
                  * SQRT(CAST({_DOT_SQL.format(a='qe', b='qe')}
                              AS DOUBLE))) AS cosine
      FROM coarse)
    SELECT vec_id, label, code_cos, cosine FROM refined
    ORDER BY cosine DESC, vec_id LIMIT {SQ8_K}
"""


def _cdot(a, b) -> Column:
    """Exact int64 dot product of two int8-code arrays (already
    BIGINT elements — no quantization step). Twin: ``_CDOT_SQL``."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sim_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantization ANN — the FAISS ``SQ8`` flat-scan shape,
    completing the family (brute / LSH / IVF / IVF-PQ / SQ8): the
    coarse pass scores EVERY vector but reads only its int8 codes
    (4× fewer bytes than float32; integer dot products), then an
    exact re-rank of the SQ8_SHORTLIST best code-space candidates
    removes the quantization error from the final top-10. Because the
    registered ``embed_quantize_int8`` codes are per-vector absmax
    scaled and cosine is invariant to a positive per-vector scalar,
    code cosine approximates true cosine with no correction term —
    the encode IS the index.

    At 100 TB: the coarse scan is embarrassingly parallel over the
    code column (a 1-row broadcast query, TakeOrderedAndProject keeps
    SQ8_SHORTLIST rows per partition — no corpus shuffle), and full
    float vectors are read for exactly SQ8_SHORTLIST rows. Where
    IVF bounds WHICH vectors a query touches, SQ8 bounds the BYTES
    per touch; production engines stack them (IVF-SQ), which this
    pipeline composes naturally (swap the coarse scan's input for an
    IVF cell semi-join). Unregistered (r12 budget is 0);
    ``_SQ8_ORACLE`` is the tested DuckDB twin covering codes,
    shortlist boundary, and re-rank bit-for-bit."""
    from iceberg_by_example_spark.util import detach

    # Pin the encoded relation: the 1-row query branch and the corpus
    # branch both read it (production materializes codes in the index,
    # never re-encodes per query). Bench clears the pin afterwards.
    enc = detach(_sq8_encoded(load_table(spark, sf_dir, "embeddings")))
    q = enc.filter(F.col("vec_id") == 0).select(
        F.col("qv").alias("qc"), F.col("embedding").alias("qe")
    )
    # Coarse pass projects CODES ONLY — the full float vector never
    # enters the scan's sort buffer, so the bytes-per-vector claim is
    # a plan property, not prose. The 50-row shortlist then joins
    # back for exactly the vectors the exact re-rank touches (AQE
    # broadcasts the 50-row side; the corpus side streams the pinned
    # blocks with no shuffle).
    coarse = (
        enc.filter(F.col("vec_id") != 0)
        .select("vec_id", "label", "qv")
        .crossJoin(F.broadcast(q.select("qc")))
        .filter(_cdot(F.col("qv"), F.col("qv")) > 0)
        .select(
            "vec_id",
            "label",
            _cosine(
                _cdot(F.col("qv"), F.col("qc")),
                _cdot(F.col("qv"), F.col("qv")),
                _cdot(F.col("qc"), F.col("qc")),
            ).alias("code_cos"),
        )
        .orderBy(F.desc("code_cos"), F.asc("vec_id"))
        .limit(SQ8_SHORTLIST)
    )
    return (
        coarse.join(enc.select("vec_id", "embedding"), "vec_id")
        .crossJoin(F.broadcast(q.select("qe")))
        .select(
            "vec_id",
            "label",
            "code_cos",
            _cosine(
                _qdot(F.col("embedding"), F.col("qe")),
                _qnorm2(F.col("embedding")),
                _qnorm2(F.col("qe")),
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(SQ8_K)
    )


_IVF_SQ8_ORACLE = f"""
    WITH {_SQ8_ENC_SQL},
    assigned AS (
      SELECT vec_id, label, embedding, qv,
             LIST_MIN({{keys}}) % {IVF_K} AS cell
      FROM enc),
    q AS (
      SELECT qv AS qc, embedding AS qe,
             LIST_TRANSFORM(LIST_SORT({{keys}})[1:{IVF_NPROBE}],
                            x -> x % {IVF_K}) AS probe_cells
      FROM enc WHERE vec_id = 0),
    coarse AS (
      SELECT a.vec_id, a.label, a.cell,
             CAST({_CDOT_SQL.format(a='a.qv', b='q.qc')} AS DOUBLE)
               / (SQRT(CAST({_CDOT_SQL.format(a='a.qv', b='a.qv')}
                            AS DOUBLE))
                  * SQRT(CAST({_CDOT_SQL.format(a='q.qc', b='q.qc')}
                              AS DOUBLE))) AS code_cos
      FROM assigned a, q
      WHERE LIST_CONTAINS(q.probe_cells, a.cell) AND a.vec_id != 0
        AND {_CDOT_SQL.format(a='a.qv', b='a.qv')} > 0
      ORDER BY code_cos DESC, a.vec_id LIMIT {SQ8_SHORTLIST})
    SELECT c.vec_id, c.label, c.cell, c.code_cos,
           CAST({_DOT_SQL.format(a='e.embedding', b='q.qe')} AS DOUBLE)
             / (SQRT(CAST({_DOT_SQL.format(a='e.embedding',
                                           b='e.embedding')} AS DOUBLE))
                * SQRT(CAST({_DOT_SQL.format(a='q.qe', b='q.qe')}
                            AS DOUBLE))) AS cosine
    FROM coarse c JOIN embeddings e ON c.vec_id = e.vec_id, q
    ORDER BY cosine DESC, c.vec_id LIMIT {SQ8_K}
"""


def _ivf_sq8_oracle() -> str:
    return _IVF_SQ8_ORACLE.replace("{keys}", _ivf_keys_sql("embedding"))


SQ8_ENCODE_SCHEMA = (
    "vec_id long, label int, embedding array<float>, scale double, "
    "qv array<long>, cell long, probe_cells array<long>"
)


def sq8_encode_batches(pdfs):
    """Arrow-batched IVF-SQ8 encoder — the same FAISS-kernel shape as
    ``pq_encode_batches`` and for the same reason: the cell
    assignment is a dense integer GEMM (every vector against every
    centroid), which interpreted higher-order expressions evaluate
    ~10× slower. Cells come from exact int64 d² = Σq² − 2·q·Cᵀ + Σc²
    (bit-equal to ``_ivf_key``'s injective argmin); the int8 codes
    mirror ``_sq8_encoded``'s FLOOR(x/scale + 0.5) in float64 — IEEE
    division/addition/floor are identical operations in numpy and
    the JVM, so codes and scales match the expression forms
    bit-for-bit (pytest-pinned). ``probe_cells`` is computed only
    for the query row, as in the PQ encoder."""
    import numpy as np
    import pandas as pd

    cent = np.asarray(IVF_CENTROIDS, dtype=np.int64)  # (K, DIM)
    cent_sq = (cent * cent).sum(axis=1)  # (K,)
    for pdf in pdfs:
        if not len(pdf):
            continue
        x = np.stack(pdf["embedding"].to_numpy())  # (n, DIM) float32
        x64 = x.astype(np.float64)
        scale = np.abs(x64).max(axis=1) / 127.0  # (n,)
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor(x64 / scale[:, None] + 0.5)
        q = np.where(scale[:, None] == 0.0, 0.0, q)
        qv = np.clip(q, -127, 127).astype(np.int64)
        iq = np.floor(x64 * QUANT).astype(np.int64)
        d2 = (
            (iq * iq).sum(axis=1, keepdims=True)
            - 2 * (iq @ cent.T)
            + cent_sq[None, :]
        )
        keys = d2 * IVF_K + np.arange(IVF_K, dtype=np.int64)[None, :]
        cells = keys.argmin(axis=1).astype(np.int64)
        vid = pdf["vec_id"].to_numpy()
        probe = [np.empty(0, dtype=np.int64)] * len(x)
        for i in np.flatnonzero(vid == 0):
            probe[i] = np.argsort(keys[i])[:IVF_NPROBE].astype(np.int64)
        yield pd.DataFrame(
            {
                "vec_id": vid,
                "label": pdf["label"].to_numpy(),
                "embedding": list(pdf["embedding"]),
                "scale": scale,
                "qv": list(qv),
                "cell": cells,
                "probe_cells": probe,
            }
        )


def sim_ivf_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ8 — the stacked index ``sim_sq8_topk``'s docstring
    promises composes naturally, and the FAISS ``IVF<K>,SQ8`` factory
    string production deployments actually run: IVF cells bound WHICH
    vectors a query touches (~NPROBE/K of the corpus), per-vector int8
    codes bound the BYTES each touch costs, and the exact re-rank
    removes quantization error from the final top-10. Pure
    composition of the two audited pieces — seed-derived cell
    assignment (``_ivf_key``) over the shared ``_sq8_encoded``
    relation, the cell semi-join feeding the codes-only coarse scan.

    At 100 TB the multipliers stack: a 16-cell/4-probe config reads
    ~1/4 of the corpus and 1/4 of the bytes per row → ~16× less I/O
    than brute force before the shortlist even forms, with zero
    corpus-side shuffle (assignment and encode are maps; the query is
    a 1-row broadcast; both top-ks are TakeOrderedAndProject).
    Unregistered; ``_ivf_sq8_oracle()`` is the tested DuckDB twin.

    Encode-stage note: like IVF-PQ, the encode runs as the
    Arrow-batched numpy worker (``sq8_encode_batches``) rather than
    the expression forms — the 16-centroid assignment is a dense
    GEMM, and the batch encoder measured ~3× faster end-to-end at
    sf0.1 while staying bit-identical (pinned by
    ``test_sq8_encode_batches_matches_expressions``)."""
    from iceberg_by_example_spark.util import detach

    e = load_table(spark, sf_dir, "embeddings")
    enc = detach(
        e.select("vec_id", "label", "embedding").mapInPandas(
            sq8_encode_batches, SQ8_ENCODE_SCHEMA
        )
    )
    q = enc.filter(F.col("vec_id") == 0).select(
        F.col("qv").alias("qc"),
        F.col("embedding").alias("qe"),
        "probe_cells",
    )
    coarse = (
        enc.filter(F.col("vec_id") != 0)
        .select("vec_id", "label", "cell", "qv")
        .crossJoin(F.broadcast(q.select("qc", "probe_cells")))
        .filter(
            F.array_contains(F.col("probe_cells"), F.col("cell"))
            & (_cdot(F.col("qv"), F.col("qv")) > 0)
        )
        .select(
            "vec_id",
            "label",
            "cell",
            _cosine(
                _cdot(F.col("qv"), F.col("qc")),
                _cdot(F.col("qv"), F.col("qv")),
                _cdot(F.col("qc"), F.col("qc")),
            ).alias("code_cos"),
        )
        .orderBy(F.desc("code_cos"), F.asc("vec_id"))
        .limit(SQ8_SHORTLIST)
    )
    return (
        coarse.join(enc.select("vec_id", "embedding"), "vec_id")
        .crossJoin(F.broadcast(q.select("qe")))
        .select(
            "vec_id",
            "label",
            "cell",
            "code_cos",
            _cosine(
                _qdot(F.col("embedding"), F.col("qe")),
                _qnorm2(F.col("embedding")),
                _qnorm2(F.col("qe")),
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(SQ8_K)
    )


@register(
    "dedup_embedding_lsh",
    bench=True,
    oracle=f"""
    WITH bucketed AS (
      SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket,
             {_DOT_SQL.format(a='embedding', b='embedding')} AS n2
      FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST({_DOT_SQL.format(a='a.embedding', b='b.embedding')} AS DOUBLE)
             / (SQRT(CAST(a.n2 AS DOUBLE)) * SQRT(CAST(b.n2 AS DOUBLE)))
             AS cosine
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE CAST({_DOT_SQL.format(a='a.embedding', b='b.embedding')} AS DOUBLE)
            / (SQRT(CAST(a.n2 AS DOUBLE)) * SQRT(CAST(b.n2 AS DOUBLE)))
          >= 0.35
    """,
    category="dedup",
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at scale: candidate pairs come only from
    WITHIN a sign-LSH bucket (high-cosine vectors agree on most
    hyperplane signs, so near-dups co-bucket with high probability),
    then exact quantized cosine on candidates. This is the bucketed
    production variant of ``dedup_embedding_cosine``'s documented
    O(n²) verify: the self-join keys on (bucket), so the pair space
    is Σ bucket_size² — ~1/256 of n² under the 8-plane split — and
    the shuffle is a plain key join, no cartesian anywhere (the
    never-cartesian plan test covers it). Recall is tunable the
    standard way: fewer planes or multi-probe neighboring buckets;
    the oracle mirrors the exact same deterministic bucketing, so the
    approximate CANDIDATE SET itself is what gets verified."""
    e = load_table(spark, sf_dir, "embeddings")
    bucketed = e.select(
        "vec_id",
        "embedding",
        _bucket_expr(F.col("embedding")).alias("bucket"),
        _qnorm2(F.col("embedding")).alias("n2"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    cosine = _cosine(
        _qdot(F.col("a.embedding"), F.col("b.embedding")),
        F.col("a.n2"),
        F.col("b.n2"),
    )
    return pairs.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        cosine.alias("cosine"),
    ).filter(F.col("cosine") >= 0.35)


# ---------------------------------------------------------------------------
# Random-projection dimensionality reduction (Johnson–Lindenstrauss)
# ---------------------------------------------------------------------------

RP_OUT_DIM = 16


def _rp_matrix() -> list[list[int]]:
    """±1 projection matrix (RP_OUT_DIM × DIM) from a fixed seed —
    the same seed-derived-literal trick as ``_planes``, so both
    engines multiply by the identical matrix. A ±1 (Achlioptas)
    projection satisfies the JL guarantee with no floats involved,
    which keeps the arithmetic exact in the quantized domain."""
    rng = random.Random(7)
    return [
        [rng.choice((-1, 1)) for _ in range(DIM)] for _ in range(RP_OUT_DIM)
    ]


RP_MATRIX = _rp_matrix()


def _rp_component(emb, weights: list[int]) -> Column:
    w = F.array(*[F.lit(v) for v in weights])
    return F.aggregate(
        F.zip_with(
            emb,
            w,
            lambda x, s: F.floor(x.cast("double") * QUANT) * s.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _rp_component_sql(emb: str, weights: list[int]) -> str:
    w = "[" + ", ".join(str(v) for v in weights) + "]"
    return (
        f"CAST(LIST_SUM(LIST_TRANSFORM(LIST_ZIP({emb}, {w}), "
        f"s -> CAST(FLOOR(CAST(s[1] AS DOUBLE)*{QUANT}) AS BIGINT)"
        f" * CAST(s[2] AS BIGINT))) AS BIGINT)"
    )


def random_projection_vectors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Array-shaped JL projection (``rp_q: array<bigint>``) — the
    native form callers feed into a downstream index. Unregistered:
    the grading driver cannot hash array cells (registry rule 4), so
    the registered query below canonicalizes to a string."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.array(
            *[_rp_component(F.col("embedding"), w) for w in RP_MATRIX]
        ).alias("rp_q"),
    )


@register(
    "embed_random_projection",
    oracle=f"""
    SELECT vec_id, label,
           CONCAT_WS(',',
             {", ".join(_rp_component_sql('embedding', w) for w in RP_MATRIX)}
           ) AS rp_q
    FROM embeddings
    """,
    category="similarity",
)
def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction: project the
    64-dim embedding onto {RP_OUT_DIM} seed-derived ±1 hyperplanes —
    the standard cheap pre-step before an ANN index or a coarse
    clustering pass (pairwise distances are preserved within ~ε while
    index memory drops 4×). Components are in the exact quantized
    integer domain (sums of floor(x·1e6)·±1 — bit-identical in both
    engines; divide by 1e6 to read float values) and are emitted as
    ONE comma-joined string per registry rule 4 (the driver's pandas
    hasher cannot hash list cells); ``random_projection_vectors``
    above keeps the array shape for API callers.

    Scale shape: a narrow map stage — no shuffle, no UDF, the 16
    dot products run inside whole-stage codegen over each row. The
    matrix is a compile-time literal: nothing is broadcast, any
    executor regenerates it from the seed."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.concat_ws(
            ",",
            *[
                _rp_component(F.col("embedding"), w).cast("string")
                for w in RP_MATRIX
            ],
        ).alias("rp_q"),
    )


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized ANN (the FAISS IVFPQ index shape)
# ---------------------------------------------------------------------------
# The 64-dim embedding is split into PQ_M subspaces of PQ_SUBDIM
# components; each subspace is vector-quantized against a PQ_CODES-entry
# codebook, so a vector compresses from 64 floats (256 B) to PQ_M
# 4-bit codes (4 B) — the memory lever that makes billion-vector ANN
# fit in RAM at 100 TB corpus scale. Codebooks are seed-derived integer
# literals in the quantized domain (same idiom as IVF_CENTROIDS and the
# JL matrix), so encoding, the ADC lookup, and the shortlist are
# bit-reproducible in DuckDB.

PQ_M = 8  # subspaces
PQ_SUBDIM = DIM // PQ_M
PQ_CODES = 16  # 4-bit codes
PQ_SHORTLIST = 50  # ADC candidates re-ranked exactly


def _pq_codebooks() -> list[list[list[int]]]:
    """PQ_M codebooks × PQ_CODES codes × PQ_SUBDIM integer components
    (quantized units, ±0.3 float — inside the corpus |x| < 0.53 range).

    Bounds: per-component diff ≤ 830k → diff² ≤ 6.9e11; a subspace
    distance sums PQ_SUBDIM=8 of them ≤ 5.6e12; the injective argmin
    key multiplies by PQ_CODES=16 ≤ 8.9e13; the ADC total sums PQ_M=8
    subspace distances ≤ 4.5e13 — all ≪ 2^63."""
    rng = random.Random(1234)
    return [
        [
            [rng.randint(-300_000, 300_000) for _ in range(PQ_SUBDIM)]
            for _ in range(PQ_CODES)
        ]
        for _ in range(PQ_M)
    ]


PQ_CODEBOOKS = _pq_codebooks()


def _pq_sub(emb, m: int):
    """Subvector of subspace m (1-based slice, PQ_SUBDIM wide)."""
    return F.slice(emb, m * PQ_SUBDIM + 1, PQ_SUBDIM)


def _pq_d2(sub, code: list[int]) -> Column:
    """Exact integer squared L2 distance from a (float) subvector to a
    quantized-integer code vector."""
    c = F.array(*[F.lit(v) for v in code])
    return F.aggregate(
        F.zip_with(
            sub,
            c,
            lambda x, cv: (F.floor(x.cast("double") * QUANT) - cv)
            * (F.floor(x.cast("double") * QUANT) - cv),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _pq_code(emb, m: int) -> Column:
    """Nearest code id in subspace m — injective key d2·CODES + c, so
    LEAST picks the nearest code and ties resolve to the lowest id."""
    keys = F.array(
        *[
            _pq_d2(_pq_sub(emb, m), PQ_CODEBOOKS[m][c]) * PQ_CODES + F.lit(c)
            for c in range(PQ_CODES)
        ]
    )
    return F.array_min(keys) % PQ_CODES


def _pq_adc(qe, codes) -> Column:
    """Asymmetric distance: exact query subvectors vs the candidate's
    reconstructed codes — Σ_m d2(q_sub_m, codebook[m][code_m]). The
    codebook entry is selected by the candidate's (data-dependent)
    code via element_at on a literal array-of-arrays."""
    total = F.lit(0).cast("long")
    for m in range(PQ_M):
        cb = F.array(
            *[
                F.array(*[F.lit(v) for v in code])
                for code in PQ_CODEBOOKS[m]
            ]
        )
        cvec = F.element_at(
            cb, (F.element_at(codes, m + 1) + F.lit(1)).cast("int")
        )
        d2 = F.aggregate(
            F.zip_with(
                _pq_sub(qe, m),
                cvec,
                lambda x, cv: (F.floor(x.cast("double") * QUANT) - cv)
                * (F.floor(x.cast("double") * QUANT) - cv),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        total = total + d2
    return total


def _pq_sub_sql(emb: str, m: int) -> str:
    return f"{emb}[{m * PQ_SUBDIM + 1}:{(m + 1) * PQ_SUBDIM}]"


def _pq_d2_sql(sub: str, code: list[int]) -> str:
    c = "[" + ", ".join(str(v) for v in code) + "]"
    diff = (
        f"(CAST(FLOOR(CAST(s[1] AS DOUBLE)*{QUANT}) AS BIGINT)"
        f" - CAST(s[2] AS BIGINT))"
    )
    return (
        f"CAST(LIST_SUM(LIST_TRANSFORM(LIST_ZIP({sub}, {c}), "
        f"s -> {diff} * {diff})) AS BIGINT)"
    )


def _pq_code_sql(emb: str, m: int) -> str:
    keys = ", ".join(
        f"({_pq_d2_sql(_pq_sub_sql(emb, m), PQ_CODEBOOKS[m][c])}"
        f" * {PQ_CODES} + {c})"
        for c in range(PQ_CODES)
    )
    return f"CAST(LIST_MIN([{keys}]) % {PQ_CODES} AS BIGINT)"


def _pq_codes_sql(emb: str) -> str:
    return "[" + ", ".join(_pq_code_sql(emb, m) for m in range(PQ_M)) + "]"


def _pq_adc_sql(qe: str, codes: str) -> str:
    terms = []
    for m in range(PQ_M):
        cb = (
            "["
            + ", ".join(
                "[" + ", ".join(str(v) for v in code) + "]"
                for code in PQ_CODEBOOKS[m]
            )
            + "]"
        )
        sub = _pq_sub_sql(qe, m)
        diff = (
            f"(CAST(FLOOR(CAST(s[1] AS DOUBLE)*{QUANT}) AS BIGINT)"
            f" - CAST(s[2] AS BIGINT))"
        )
        terms.append(
            f"CAST(LIST_SUM(LIST_TRANSFORM(LIST_ZIP({sub}, "
            f"{cb}[CAST({codes}[{m + 1}] + 1 AS INT)]), "
            f"s -> {diff} * {diff})) AS BIGINT)"
        )
    return "(" + " + ".join(terms) + ")"


PQ_ENCODE_SCHEMA = (
    "vec_id long, embedding array<float>, cell long, "
    "codes array<long>, probe_cells array<long>"
)


def pq_encode_batches(pdfs):
    """Arrow-batched IVF-PQ encoder: per batch, quantize to int64 and
    compute every vector-to-centroid / vector-to-code squared distance
    as d² = Σq² − 2·q·Cᵀ + Σc² — three integer matmuls, no 3-D
    temporaries. All arithmetic is exact int64 (bounds in
    ``_pq_codebooks``), so the emitted cells/codes equal the
    ``_ivf_key``/``_pq_code`` expression forms bit-for-bit; argmin's
    first-occurrence rule realizes the same lowest-id tie-break as
    their injective keys. ``probe_cells`` is the NPROBE-cell probe
    ranking (keys are injective ⇒ unique ⇒ stable) computed ONLY for
    the query row (vec_id=0) — corpus rows carry an empty list, so
    the encode output stays 4-bytes-per-vector-ish (cell + codes),
    not a per-row cell ranking."""
    import numpy as np
    import pandas as pd

    cent = np.asarray(IVF_CENTROIDS, dtype=np.int64)  # (K, DIM)
    cent_sq = (cent * cent).sum(axis=1)  # (K,)
    cbs = np.asarray(PQ_CODEBOOKS, dtype=np.int64)  # (M, CODES, SUB)
    for pdf in pdfs:
        if not len(pdf):
            continue
        x = np.stack(pdf["embedding"].to_numpy())  # (n, DIM) float32
        qv = np.floor(x.astype(np.float64) * QUANT).astype(np.int64)
        qsq = (qv * qv).sum(axis=1, keepdims=True)  # (n, 1)
        d2 = qsq - 2 * (qv @ cent.T) + cent_sq[None, :]  # (n, K)
        keys = d2 * IVF_K + np.arange(IVF_K, dtype=np.int64)[None, :]
        cells = keys.argmin(axis=1).astype(np.int64)
        vid = pdf["vec_id"].to_numpy()
        probe = [np.empty(0, dtype=np.int64)] * len(x)
        for i in np.flatnonzero(vid == 0):
            probe[i] = np.argsort(keys[i])[:IVF_NPROBE].astype(np.int64)
        codes = np.empty((len(x), PQ_M), dtype=np.int64)
        for m in range(PQ_M):
            sub = qv[:, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
            cb = cbs[m]  # (CODES, SUB)
            d2m = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2 * (sub @ cb.T)
                + (cb * cb).sum(axis=1)[None, :]
            )
            keym = d2m * PQ_CODES + np.arange(PQ_CODES, dtype=np.int64)
            codes[:, m] = keym.argmin(axis=1)
        yield pd.DataFrame(
            {
                "vec_id": vid,
                "embedding": list(pdf["embedding"]),
                "cell": cells,
                "codes": list(codes),
                "probe_cells": probe,
            }
        )


@register(
    "sim_ivf_pq_topk",
    oracle=f"""
    WITH assigned AS (
      SELECT vec_id, embedding,
             LIST_MIN({_ivf_keys_sql('embedding')}) % {IVF_K} AS cell,
             {_pq_codes_sql('embedding')} AS codes
      FROM embeddings),
    q AS (
      SELECT embedding AS qe,
             LIST_TRANSFORM(
               LIST_SORT({_ivf_keys_sql('embedding')})[1:{IVF_NPROBE}],
               x -> x % {IVF_K}) AS probe_cells
      FROM embeddings WHERE vec_id = 0),
    cands AS (
      SELECT a.vec_id, a.cell, a.embedding, a.codes, q.qe
      FROM assigned a, q
      WHERE LIST_CONTAINS(q.probe_cells, a.cell) AND a.vec_id != 0),
    scored AS (
      SELECT vec_id, cell, embedding, qe,
             {_pq_adc_sql('qe', 'codes')} AS adc
      FROM cands),
    short AS (
      SELECT * FROM scored ORDER BY adc, vec_id LIMIT {PQ_SHORTLIST})
    SELECT vec_id, CAST(cell AS BIGINT) AS cell, CAST(adc AS BIGINT) AS adc,
           CAST({_DOT_SQL.format(a='embedding', b='qe')} AS DOUBLE)
             / (SQRT(CAST({_DOT_SQL.format(a='embedding', b='embedding')} AS DOUBLE))
                * SQRT(CAST({_DOT_SQL.format(a='qe', b='qe')} AS DOUBLE))) AS cosine
    FROM short
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    category="similarity",
    bench=True,
)
def sim_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN — the FAISS ``IVFPQ`` shape as a DataFrame pipeline:
    coarse IVF cells bound WHICH vectors a query touches (~NPROBE/K of
    the corpus), product quantization bounds the BYTES each touch
    costs (PQ_M 4-bit codes = 4 B instead of a 256 B float vector),
    and an exact re-rank of the PQ_SHORTLIST best ADC candidates
    removes the quantization error from the final top-10.

    Stages: (1) encode — cell id + PQ codes, a pure map in whole-stage
    codegen (codebooks are compile-time literals, nothing broadcast);
    (2) probe — semi-join the 1-row broadcast query's NPROBE cells;
    (3) ADC score from codes alone (the stage that at production scale
    reads the 4 B code table, never the vectors); (4) exact cosine
    re-rank of the 50-candidate shortlist. Everything is quantized-
    integer arithmetic, so the full approximate path — codes, ADC,
    shortlist boundary, re-rank — oracle-checks bit-for-bit.

    At 100 TB: the code table for 1e9 vectors is ~4 GB (memory-
    resident per executor), vector reads happen only for the
    shortlist, and every stage is a map or a 1-row broadcast —
    no corpus-side shuffle anywhere.

    Encode-stage implementation note: the encode is a dense
    integer GEMM (every vector against every centroid/code), which is
    the wrong shape for scalar SQL expressions — the zip_with
    reference forms (``_pq_code``/``_ivf_key``) evaluate as
    interpreted higher-order functions (~11 s / 2000 rows), and
    flattening them into ~5k scalar expressions trades that for
    minutes of Catalyst planning. Production ANN encodes with SIMD
    kernels (FAISS), and the Spark-shaped equivalent is an
    Arrow-batched vectorized worker: ``pq_encode_batches`` does the
    whole batch as three numpy matmuls in exact int64
    (d² = Σq² − 2·q·C + Σc², identical integers to the reference
    forms — a pytest pins them equal), ~100× the expression forms.
    Probe, ADC, and re-rank stay relational."""
    from iceberg_by_example_spark.util import detach

    e = load_table(spark, sf_dir, "embeddings")
    # Pin the encoded table: the query branch and the candidate branch
    # both read it, and without the pin each would run its own encode
    # pass (the production analogue is that codes are MATERIALIZED in
    # the index, not recomputed per query). r20 re-measured the
    # alternative (encode the vec_id=0 query row from its own pushed-
    # filter 1-row scan, corpus encode single-consumer and unpinned,
    # re-rank joining the base table for shortlist vectors): REJECTED
    # — fresh-JVM interleaved floors 1.84-2.17s vs 1.72-1.75s for this
    # form at matched canaries. At 2000 rows the checkpoint write is
    # trivial and the second Python stage launch dominates — the
    # opposite economics of the BM25 postings pin (1M string rows),
    # which r20 removed on the same measurement protocol.
    assigned = detach(
        e.select("vec_id", "embedding").mapInPandas(
            pq_encode_batches, PQ_ENCODE_SCHEMA
        )
    )
    q = assigned.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), "probe_cells"
    )
    cands = assigned.drop("probe_cells").crossJoin(F.broadcast(q)).filter(
        F.array_contains(F.col("probe_cells"), F.col("cell"))
        & (F.col("vec_id") != 0)
    )
    scored = cands.select(
        "vec_id",
        "cell",
        "embedding",
        "qe",
        _pq_adc(F.col("qe"), F.col("codes")).alias("adc"),
    )
    short = scored.orderBy(F.asc("adc"), F.asc("vec_id")).limit(PQ_SHORTLIST)
    return (
        short.select(
            "vec_id",
            "cell",
            "adc",
            _cosine(
                _qdot(F.col("embedding"), F.col("qe")),
                _qnorm2(F.col("embedding")),
                _qnorm2(F.col("qe")),
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# MMR: maximal-marginal-relevance diversified retrieval
# ---------------------------------------------------------------------------

MMR_LAMBDA = 0.7
# NOT computed as 1 - MMR_LAMBDA: that is 0.30000000000000004 in
# binary64, and the oracle must multiply by the bit-identical
# constant — both sides parse the literal string "0.3"/"0.7".
MMR_MU = 0.3
MMR_POOL = 30  # relevance shortlist the greedy selection works over
MMR_K = 10


def _mmr_oracle_sql() -> str:
    """Greedy MMR as a DuckDB recursive CTE: the anchor picks the most
    relevant candidate, scored λ·rel — the empty-picked-set case of
    the same scale every later rank uses; each recursive step scores
    the remaining pool
    by λ·rel − (1−λ)·max-sim-to-picked and appends the argmax (ties to
    the lowest vec_id). Both engines run the identical IEEE ops on
    identical quantized-integer cosines, so scores match bit-for-bit."""
    cos = lambda a, b: (
        f"CAST({_DOT_SQL.format(a=a, b=b)} AS DOUBLE) / "
        f"(SQRT(CAST({_DOT_SQL.format(a=a, b=a)} AS DOUBLE)) * "
        f"SQRT(CAST({_DOT_SQL.format(a=b, b=b)} AS DOUBLE)))"
    )
    return f"""
    WITH RECURSIVE
    qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    cand AS (
      SELECT e.vec_id, e.embedding, {cos('e.embedding', 'qv.qe')} AS rel
      FROM embeddings e, qv WHERE e.vec_id != 0
      ORDER BY rel DESC, vec_id LIMIT {MMR_POOL}),
    pair AS (
      SELECT a.vec_id AS a, b.vec_id AS b,
             {cos('a.embedding', 'b.embedding')} AS sim
      FROM cand a JOIN cand b ON a.vec_id != b.vec_id),
    sel AS (
      (SELECT 1 AS rank, [vec_id] AS picked, vec_id,
              CAST('{MMR_LAMBDA}' AS DOUBLE) * rel AS mmr_score
       FROM cand ORDER BY rel DESC, vec_id LIMIT 1)
      UNION ALL
      (SELECT s.rank + 1, LIST_APPEND(s.picked, c.vec_id), c.vec_id,
              CAST('{MMR_LAMBDA}' AS DOUBLE) * c.rel
              - CAST('{MMR_MU}' AS DOUBLE) * (
                SELECT MAX(p.sim) FROM pair p
                WHERE p.a = c.vec_id AND LIST_CONTAINS(s.picked, p.b))
                AS score
       FROM sel s JOIN cand c ON NOT LIST_CONTAINS(s.picked, c.vec_id)
       WHERE s.rank < {MMR_K}
       ORDER BY score DESC, c.vec_id
       LIMIT 1)
    )
    SELECT rank, vec_id, mmr_score FROM sel
    """


@register(
    "sim_mmr_topk",
    oracle=_mmr_oracle_sql(),
    category="similarity",
    bench=True,
)
def sim_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified top-k by maximal marginal relevance (Carbonell &
    Goldstein): greedily pick argmax λ·sim(q,d) − (1−λ)·max_{s∈S}
    sim(d,s), so results cover the query's neighborhood instead of
    returning {MMR_K} copies of the same cluster — the retrieval shape
    RAG rerankers and dataset-diversification passes use.

    Scale split: everything that touches the CORPUS is Spark — the
    relevance pass (one scan against the 1-row broadcast query) and
    the {MMR_POOL}×{MMR_POOL} candidate similarity matrix. The greedy
    selection itself is O(K·POOL) comparisons over {MMR_POOL}
    driver-side doubles — constants, independent of corpus size, the
    same bounded-driver dispatch as the union-find gate
    (``CLUSTER_DRIVER_MAX_EDGES``); at 100 TB the scan dominates and
    the pool stays {MMR_POOL} rows. Scores stay bit-reproducible:
    cosines are quantized-integer exact, and the driver applies the
    identical IEEE multiply/subtract both engines run (the oracle's
    recursive CTE replays the same greedy trajectory)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            "embedding",
            _cosine(
                _qdot(F.col("embedding"), F.col("qe")),
                _qnorm2(F.col("embedding")),
                _qnorm2(F.col("qe")),
            ).alias("rel"),
        )
    )
    from iceberg_by_example_spark.util import detach

    cand = detach(
        scored.orderBy(F.desc("rel"), F.asc("vec_id")).limit(MMR_POOL)
    )
    a, b = cand.alias("a"), cand.alias("b")
    pair = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("a_id"),
        F.col("b.vec_id").alias("b_id"),
        _cosine(
            _qdot(F.col("a.embedding"), F.col("b.embedding")),
            _qnorm2(F.col("a.embedding")),
            _qnorm2(F.col("b.embedding")),
        ).alias("sim"),
    )
    rels = {
        r["vec_id"]: r["rel"] for r in cand.select("vec_id", "rel").collect()
    }
    sims = {(r["a_id"], r["b_id"]): r["sim"] for r in pair.collect()}

    picked: list[tuple[int, int, float]] = []  # (rank, vec_id, score)
    chosen: list[int] = []
    first = min(rels, key=lambda v: (-rels[v], v))
    # canonical MMR scores the seed on the same λ·rel scale as every
    # later rank (with an empty picked set the penalty term is 0), so
    # mmr_score is comparable across ranks
    picked.append((1, first, MMR_LAMBDA * rels[first]))
    chosen.append(first)
    while len(picked) < MMR_K and len(chosen) < len(rels):
        best = None
        for v, rel in rels.items():
            if v in chosen:
                continue
            score = MMR_LAMBDA * rel - MMR_MU * max(
                sims[(v, s)] for s in chosen
            )
            if best is None or score > best[0] or (
                score == best[0] and v < best[1]
            ):
                best = (score, v)
        picked.append((len(picked) + 1, best[1], best[0]))
        chosen.append(best[1])
    return spark.createDataFrame(
        picked, "rank int, vec_id long, mmr_score double"
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic deduplication within coarse clusters
# ---------------------------------------------------------------------------

# Cosine threshold for "semantically the same". Real SemDeDup tunes
# this per-embedding-model (0.95+ for trained encoders); this corpus's
# planted near-dup structure sits at the same 0.35 the exact-verify
# operator (dedup_embedding_cosine) uses, so the two operators'
# outputs compose (SemDeDup removals ⊆ pair graph restricted to
# same-cell pairs).
SEMDEDUP_TAU = 0.35


@register(
    "dedup_semdedup",
    oracle=f"""
    WITH asg AS (
      SELECT vec_id, embedding,
             LIST_MIN({_ivf_keys_sql('embedding')}) AS mk,
             LIST_MIN({_ivf_keys_sql('embedding')}) % {IVF_K} AS cell,
             {_DOT_SQL.format(a='embedding', b='embedding')} AS n2
      FROM embeddings),
    a2 AS (
      SELECT vec_id, embedding, cell,
             CAST((mk - cell) // {IVF_K} AS BIGINT) AS d2, n2
      FROM asg),
    rem AS (
      SELECT DISTINCT a.vec_id
      FROM a2 a JOIN a2 b
        ON a.cell = b.cell AND a.vec_id != b.vec_id
      WHERE CAST({_DOT_SQL.format(a='a.embedding', b='b.embedding')} AS DOUBLE)
              / (SQRT(CAST(a.n2 AS DOUBLE)) * SQRT(CAST(b.n2 AS DOUBLE)))
              >= {SEMDEDUP_TAU}
        AND (b.d2 > a.d2 OR (b.d2 = a.d2 AND b.vec_id < a.vec_id)))
    SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell, a.d2,
           (r.vec_id IS NOT NULL) AS removed
    FROM a2 a LEFT JOIN rem r ON a.vec_id = r.vec_id
    """,
    category="dedup",
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup that only compares
    WITHIN coarse clusters — embeddings are k-means-clustered (here:
    the same deterministic IVF cells the ANN index uses), and inside
    each cluster any pair with cosine ≥ SEMDEDUP_TAU is a semantic
    duplicate group, from which the member FARTHEST from the cluster
    centroid is kept (the paper's keep-low-centroid-similarity rule —
    it preserves the cluster's diverse rim over its redundant core).
    A vector is ``removed`` iff some same-cell neighbor above the
    threshold beats it on (centroid-d² DESC, vec_id ASC) — a pure
    pairwise rule, so the result is order- and partitioning-invariant.

    Output: every vector with its cell, exact quantized centroid-d²,
    and the removal verdict — the downstream corpus filter is
    ``WHERE NOT removed``.

    Scale shape: the cluster assignment is a map over literal
    centroids (no shuffle — the sim_ivf_topk plan); the pair
    comparison is a self-join ON CELL, which is the entire point of
    SemDeDup — with k ∝ corpus size, cells stay O(corpus/k) and the
    join is Σ|cell|² ≪ n², embarrassingly parallel across cells,
    shuffled once on the cell key. The removal rule needs no global
    state (compare-to-neighbors, not compare-to-winner), so no
    iteration, no driver round-trips. The assignment map feeds three
    consumers (both self-join sides + the output join) and is
    DELIBERATELY recomputed rather than pinned — it is corpus-sized
    (it carries the vectors the cosine needs), and in production the
    cell assignment is MATERIALIZED in the ANN index anyway, making
    the recompute an artifact of this self-contained form. Cites the
    reference's dedup suite for the exact-dup analogue (keep-first);
    the semantic family is additive (SURVEY.md north-star
    extension)."""
    e = load_table(spark, sf_dir, "embeddings")
    keys = F.array(*[_ivf_key(F.col("embedding"), k) for k in range(IVF_K)])
    asg = e.select(
        "vec_id",
        "embedding",
        F.array_min(keys).alias("mk"),
        (F.array_min(keys) % IVF_K).alias("cell"),
        _qnorm2(F.col("embedding")).alias("n2"),
    ).select(
        "vec_id",
        "embedding",
        "cell",
        F.expr(f"(mk - cell) div {IVF_K}").alias("d2"),
        "n2",
    )
    a, b = asg.alias("a"), asg.alias("b")
    cos = _cosine(
        _qdot(F.col("a.embedding"), F.col("b.embedding")),
        F.col("a.n2"),
        F.col("b.n2"),
    )
    beats = (F.col("b.d2") > F.col("a.d2")) | (
        (F.col("b.d2") == F.col("a.d2"))
        & (F.col("b.vec_id") < F.col("a.vec_id"))
    )
    removed = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .filter((cos >= SEMDEDUP_TAU) & beats)
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("_rm", F.lit(1))
    )
    return asg.join(removed, "vec_id", "left").select(
        "vec_id",
        "cell",
        "d2",
        F.col("_rm").isNotNull().alias("removed"),
    )


# ---------------------------------------------------------------------------
# ANN recall report: the index-quality eval the similarity family ships
# ---------------------------------------------------------------------------


def _recall_oracle_sql() -> str:
    """Composes the already-registered method oracles as subqueries —
    the report grades EXACTLY the queries the driver grades, not a
    re-derivation that could drift."""
    from iceberg_by_example_spark.plans.registry import QUERY_REGISTRY

    o = lambda n: QUERY_REGISTRY[n].oracle
    return f"""
    WITH brute AS (SELECT vec_id FROM ({o('sim_topk_cosine')}) tb),
    m AS (
      SELECT 'ivf' AS method, vec_id FROM ({o('sim_ivf_topk')}) t1
      UNION ALL
      SELECT 'ivf_pq' AS method, vec_id FROM ({o('sim_ivf_pq_topk')}) t2
      UNION ALL
      SELECT 'lsh' AS method, vec_id FROM ({o('sim_lsh_ann_topk')}) t3
    )
    SELECT m.method,
           COUNT(*) AS k_returned,
           CAST(SUM(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS hits,
           CAST(SUM(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / 10 AS recall_at_10
    FROM m LEFT JOIN brute b ON m.vec_id = b.vec_id
    GROUP BY m.method
    """


@register(
    "sim_recall_report",
    oracle=_recall_oracle_sql(),
    category="similarity",
)
def sim_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of every approximate index against the brute-force
    ground truth — the eval row an ANN deployment watches when it
    retunes NPROBE / band counts / shortlist sizes. One row per
    method: how many rows the index returned (probe misses can yield
    < 10), how many are true top-10 members, and the recall fraction.

    Built by composing the REGISTERED method queries (and the oracle
    composes their registered SQL verbatim), so the report can never
    disagree with what the driver grades per-method.

    Scale shape: each method's plan is its own bounded pipeline (all
    map + 1-row broadcast, no corpus shuffle — see the per-method
    docstrings); the report adds three 10-row unions and a broadcast
    join against the 10-row truth set. At 100 TB you'd run it over a
    SAMPLED query set (q × methods rows), still driver-free."""
    import functools

    brute = (
        sim_topk_cosine(spark, sf_dir)
        .select("vec_id")
        .withColumn("_b", F.lit(1))
    )
    parts = [
        fn(spark, sf_dir).select(F.lit(m).alias("method"), "vec_id")
        for m, fn in (
            ("ivf", sim_ivf_topk),
            ("ivf_pq", sim_ivf_pq_topk),
            ("lsh", sim_lsh_ann_topk),
        )
    ]
    un = functools.reduce(DataFrame.unionByName, parts)
    hits = F.sum(F.when(F.col("_b").isNotNull(), 1).otherwise(0))
    return (
        un.join(F.broadcast(brute), "vec_id", "left")
        .groupBy("method")
        .agg(
            F.count("*").alias("k_returned"),
            hits.alias("hits"),
            (hits.cast("double") / 10).alias("recall_at_10"),
        )
    )


# ---------------------------------------------------------------------------
# Distributed Lloyd's step: k-means refinement with exact integer means
# ---------------------------------------------------------------------------


@register(
    "sim_kmeans_refine",
    oracle=f"""
    WITH a0 AS (
      SELECT vec_id, embedding,
             LIST_MIN({_ivf_keys_sql('embedding')}) % {IVF_K} AS cell0
      FROM embeddings),
    dims AS (
      SELECT vec_id, cell0, CAST(i AS BIGINT) AS d,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE)*{QUANT}) AS BIGINT)
               AS qx
      FROM a0, LATERAL (SELECT UNNEST(GENERATE_SERIES(
             1, LEN(embedding))) AS i)),
    counts AS (SELECT cell0, COUNT(*) AS n FROM a0 GROUP BY cell0),
    sums AS (SELECT cell0, d, CAST(SUM(qx) AS BIGINT) AS s
             FROM dims GROUP BY cell0, d),
    means AS (
      SELECT s.cell0 AS cell, s.d,
             CAST(FLOOR(CAST(s.s AS DOUBLE) / c.n) AS BIGINT) AS m
      FROM sums s JOIN counts c ON s.cell0 = c.cell0),
    per AS (
      SELECT dm.vec_id, me.cell,
             CAST(SUM((dm.qx - me.m) * (dm.qx - me.m)) AS BIGINT) AS d2
      FROM dims dm JOIN means me ON dm.d = me.d
      GROUP BY dm.vec_id, me.cell),
    k1 AS (SELECT vec_id, CAST(MIN(d2 * {IVF_K} + cell) AS BIGINT) AS k
           FROM per GROUP BY vec_id)
    SELECT a.vec_id, CAST(a.cell0 AS BIGINT) AS cell0,
           k.k % {IVF_K} AS cell1,
           (a.cell0 != k.k % {IVF_K}) AS moved
    FROM a0 a JOIN k1 k ON a.vec_id = k.vec_id
    """,
    category="similarity",
)
def sim_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed Lloyd's iteration — k-means TRAINING as a
    DataFrame plan, exact cross-engine: seed cells come from the
    literal IVF centroids (map-only), the refined centroids are the
    per-cell per-dimension integer means (floor of the exact quantized
    sum over the exact count — FLOOR(double)/n, the one division both
    engines compute identically; `//`/`div` truncate differently on
    negatives), and every vector re-assigns to its nearest refined
    centroid via the injective d²·K+cell argmin. Emits per vector the
    before/after cell and a moved flag — the convergence signal a
    driver loop would watch (call again for further iterations; empty
    cells die naturally, standard Lloyd).

    Scale shape — the distributed k-means template: (1) centroid
    update is ONE groupBy (cell, dim) partial-agg over the long-form
    dims (corpus·DIM rows of 3 longs, map-side combinable); (2) the
    refined centroid table is K·DIM rows (16×64 here — kilobytes at
    any corpus size) and BROADCASTS; (3) re-assignment is a map-side
    join + one groupBy (vec, cell) — no corpus self-join, no driver
    round-trip inside the step. Iterations chain by re-running the
    step; the per-iteration cost is linear in corpus·DIM·K. The
    long-form dims are DELIBERATELY recomputed for the re-assignment
    pass rather than pinned: they are corpus·DIM rows (the one thing
    you never materialize at 100 TB), and the rebuild is a narrow
    posexplode off the scan — cheaper than the storage round-trip a
    pin would cost.

    pytest pins the Lloyd invariant: total within-cluster d² under
    the refined assignment never exceeds the seed assignment's."""
    e = load_table(spark, sf_dir, "embeddings")
    keys = F.array(*[_ivf_key(F.col("embedding"), k) for k in range(IVF_K)])
    a0 = e.select(
        "vec_id",
        "embedding",
        (F.array_min(keys) % IVF_K).alias("cell0"),
    )
    dims = a0.select(
        "vec_id",
        "cell0",
        F.posexplode("embedding").alias("d", "x"),
    ).select(
        "vec_id",
        "cell0",
        F.col("d").cast("long").alias("d"),
        F.floor(F.col("x").cast("double") * QUANT).cast("long").alias("qx"),
    )
    counts = a0.groupBy("cell0").agg(F.count("*").alias("n"))
    sums = dims.groupBy("cell0", "d").agg(F.sum("qx").alias("s"))
    means = sums.join(F.broadcast(counts), "cell0").select(
        F.col("cell0").alias("cell"),
        "d",
        F.floor(F.col("s").cast("double") / F.col("n"))
        .cast("long")
        .alias("m"),
    )
    per = (
        dims.select("vec_id", "d", "qx")
        .join(F.broadcast(means), "d")
        .groupBy("vec_id", "cell")
        .agg(
            F.sum(
                (F.col("qx") - F.col("m")) * (F.col("qx") - F.col("m"))
            ).alias("d2")
        )
    )
    k1 = per.groupBy("vec_id").agg(
        F.min(F.col("d2") * IVF_K + F.col("cell")).alias("k")
    )
    return a0.select("vec_id", "cell0").join(k1, "vec_id").select(
        "vec_id",
        F.col("cell0").cast("long").alias("cell0"),
        (F.col("k") % IVF_K).alias("cell1"),
        (F.col("cell0") != F.col("k") % IVF_K).alias("moved"),
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 lexical + dense inner-product, fused with
# Reciprocal Rank Fusion (Cormack et al.) — the standard two-stage
# retrieval shape (lexical first pass, dense re-rank, rank fusion)
# ---------------------------------------------------------------------------

from iceberg_by_example_spark.operators.text import _BM25_SCORED_CTES

RRF_POOL = 50  # per-ranker candidate pool depth
RRF_K0 = 60  # the canonical RRF smoothing constant
RRF_SCALE = 1_000_000_000  # 1/(k0+rank) in exact integer fixed point
RRF_K = 10


def _ranked_pool(scored: DataFrame, key: str, score: str) -> DataFrame:
    """Top-RRF_POOL rows by (score DESC, key ASC) with their rank.

    Two stages on purpose: the ORDER BY + LIMIT compiles to
    TakeOrderedAndProject (k rows per partition, no global sort over
    the scored relation); the row_number window then runs on the
    RRF_POOL-row result — a single tiny task, not a corpus sort."""
    from pyspark.sql import Window

    pool = scored.orderBy(F.desc(score), F.asc(key)).limit(RRF_POOL)
    w = Window.orderBy(F.desc(score), F.asc(key))
    return pool.withColumn("rk", F.row_number().over(w)).select(
        F.col(key).alias("doc_id"), "rk"
    )


@register(
    "sim_hybrid_rrf_topk",
    oracle=f"""
    WITH {{bm25_ctes}},
    lex AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id)
               AS lex_rk
      FROM (SELECT doc_id, bm25 FROM scored
            ORDER BY bm25 DESC, doc_id LIMIT {RRF_POOL})),
    qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    dots AS (
      SELECT e.vec_id,
             {{dot}} AS dot
      FROM embeddings e, qv WHERE e.vec_id != 0),
    dense AS (
      SELECT vec_id AS doc_id,
             ROW_NUMBER() OVER (ORDER BY dot DESC, vec_id) AS den_rk
      FROM (SELECT vec_id, dot FROM dots
            ORDER BY dot DESC, vec_id LIMIT {RRF_POOL})),
    fused AS (
      SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
             COALESCE(lex.lex_rk, 0) AS lex_rank,
             COALESCE(dense.den_rk, 0) AS dense_rank,
             CAST(COALESCE({RRF_SCALE} // ({RRF_K0} + lex.lex_rk), 0)
                  + COALESCE({RRF_SCALE} // ({RRF_K0} + dense.den_rk), 0)
                  AS BIGINT) AS rrf
      FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id)
    SELECT doc_id, lex_rank, dense_rank, rrf FROM fused
    ORDER BY rrf DESC, doc_id LIMIT {RRF_K}
    """.format(
        bm25_ctes=_BM25_SCORED_CTES,
        dot=_DOT_SQL.format(a="e.embedding", b="qv.qe"),
    ),
    category="similarity",
    bench=True,
)
def sim_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the BM25 lexical ranking (documents,
    text.bm25_scored, query BM25_QUERY) with the dense inner-product
    ranking (embeddings vs the vec_id=0 query vector, exact quantized
    integer dots) by Reciprocal Rank Fusion. The RRF contribution
    1/(k0+rank) is RRF_SCALE // (k0+rank) — exact integer division, so
    the fused score is bit-identical across engines; a ranker that
    missed a doc contributes rank 0 / score 0 (no nullable columns —
    the grading hash goes through pandas, where nullable int becomes
    float64).

    Scale shape: each ranker produces its RRF_POOL candidates with its
    own scale-safe plan (BM25: postings + TakeOrderedAndProject; dense:
    broadcast query, embarrassingly-parallel scan, no corpus shuffle);
    ranks attach via a window over the POOL rows only (one tiny task);
    the fusion is a full outer join of two RRF_POOL-row relations —
    broadcast-trivial at any corpus size. This is the production
    two-retriever layout: candidate generation stays distributed, only
    rank lists meet."""
    from iceberg_by_example_spark.operators.text import bm25_scored

    lex = _ranked_pool(
        bm25_scored(spark, sf_dir), "doc_id", "bm25"
    ).withColumnRenamed("rk", "lex_rk")
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    dots = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", _qdot(F.col("embedding"), F.col("qe")).alias("dot"))
    )
    dense = _ranked_pool(dots, "vec_id", "dot").withColumnRenamed(
        "rk", "den_rk"
    )
    contrib = lambda rk: F.coalesce(
        F.expr(f"CAST({RRF_SCALE} AS BIGINT) div ({RRF_K0} + {rk})"),
        F.lit(0).cast("long"),
    )
    fused = lex.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("lex_rk", F.lit(0)).alias("lex_rank"),
        F.coalesce("den_rk", F.lit(0)).alias("dense_rank"),
        (contrib("lex_rk") + contrib("den_rk")).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(RRF_K)
