"""Corpus sampling, splitting, and packing operators — the steps
between a curated corpus (operators/pipeline.py) and a training run:
deterministic train/val/test assignment, per-stratum sampling, domain
reweighting, and fixed-budget sequence packing.

All four are pure column/window plans (no UDFs, no driver loops) with
DuckDB oracle twins. Determinism rule: every pseudo-random choice is a
salted md5 of the row key — identical hex in every engine, stable
across runs, partitionings, and cluster sizes, and independent of input
order (the property `F.rand` does NOT have).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_by_example_spark.functions.text import token_count
from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table


def hash_bucket(key, salt: str):
    """First two md5 hex digits of ``salt:key`` — a uniform bucket in
    ['00'..'ff'] (256 cells). String comparison against hex literals
    carves deterministic fractions; both engines hash the identical
    bytes."""
    return F.substring(
        F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 2
    )


@register(
    "pipeline_split_hash",
    oracle="""
    SELECT doc_id, lang, source,
           SUBSTR(MD5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
           CASE WHEN SUBSTR(MD5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                THEN 'train'
                WHEN SUBSTR(MD5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    category="pipeline",
)
def pipeline_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~80/10/10) by salted content
    key. Because membership is a pure function of doc_id, the split is
    reproducible on any cluster, new documents never reshuffle old
    assignments, and train/test never leak across reruns — the
    properties random-number splits lose the moment the partitioning
    changes. Narrow (no shuffle, no join): the assignment is a scan-time
    expression."""
    d = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"), "split")
    split = (
        F.when(bucket < "cd", "train")
        .when(bucket < "e6", "val")
        .otherwise("test")
    )
    return d.select(
        "doc_id", "lang", "source", bucket.alias("bucket"), split.alias("split")
    )


@register(
    "pipeline_stratified_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang,
             MD5('sample:' || CAST(doc_id AS VARCHAR)) AS k,
             COUNT(*) OVER (PARTITION BY lang) AS stratum_n
      FROM documents),
    ranked AS (
      SELECT doc_id, lang, stratum_n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k, doc_id)
               AS sample_rank
      FROM keyed)
    SELECT doc_id, lang, stratum_n, sample_rank
    FROM ranked
    WHERE sample_rank <= CAST(CEIL(stratum_n * 0.2) AS BIGINT)
    """,
    category="pipeline",
)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional 20% sample per language stratum, chosen by salted
    hash order — every stratum contributes ceil(0.2·n) rows regardless
    of how skewed the language mix is (a uniform Bernoulli sample
    under-represents small strata).

    Scale shape: one shuffle on the stratum key for the window; rank
    only orders the stratum's own rows. For strata too hot for one
    partition, the same hash key thresholds directly (keep rows with
    k < quantile) — no global order needed."""
    d = load_table(spark, sf_dir, "documents")
    k = F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
    keyed = d.select(
        "doc_id",
        "lang",
        k.alias("k"),
        F.count("*").over(Window.partitionBy("lang")).alias("stratum_n"),
    )
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy("k", "doc_id")
    )
    return (
        keyed.withColumn("sample_rank", rk)
        .filter(
            F.col("sample_rank")
            <= F.ceil(F.col("stratum_n") * 0.2).cast("long")
        )
        .select("doc_id", "lang", "stratum_n", "sample_rank")
    )


@register(
    "pipeline_pack_sequences",
    oracle="""
    WITH sized AS (
      SELECT doc_id, source,
             LEN(STRING_SPLIT(text, ' ')) AS n_tokens
      FROM documents),
    placed AS (
      SELECT doc_id, source, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM sized)
    SELECT source,
           -- exact integral quotient, mirroring pack_stats's `div`
           -- (identical values at any sf; exact past 2^53 too)
           CAST(cum_before // 2048 AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           -- CAST: DuckDB's integer SUM yields HUGEINT, which the
           -- driver's pandas hasher renders float64 and mismatches
           -- Spark's BIGINT on value-identical results.
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM placed
    GROUP BY 1, 2
    """,
    category="pipeline",
    bench=True,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents (in stable doc_id order,
    per source) into ~2048-token training sequences, assigning each doc
    to the pack where its exclusive prefix-sum of tokens lands. This is
    the streaming-concatenation packer (docs may straddle a boundary;
    the budget bounds the *start* offset) — one window per source
    partition, no re-sorting, no driver state.

    Scale shape: packing is embarrassingly parallel across sources; a
    single hot source shards further by hash(doc_id) into independent
    pack streams (the pack key becomes (source, shard, pack_id)) with
    zero coordination, because prefix sums never cross shard
    boundaries."""
    d = load_table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", "source", token_count("text").alias("n_tokens")
    )
    return pack_stats(sized, ["source"], ["doc_id"])


def pack_stats(
    sized: DataFrame, part_cols: list, order_cols: list
) -> DataFrame:
    """Streaming-concatenation pack accounting over an already-sized
    relation ``(doc_id, <part_cols>, n_tokens, <order_cols>)``: each
    doc lands in the pack where its EXCLUSIVE per-partition prefix
    sum of tokens falls — the shared core behind the registered
    per-source/doc_id-ordered ``pipeline_pack_sequences`` and the
    curation pipeline's per-shard/shuffle-ordered packing. One window
    per partition stream, no re-sorting, no driver state."""
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = sized.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        placed.groupBy(
            *part_cols,
            # exact integral quotient (r13 ADVICE #3): cum_before is a
            # non-negative int64 prefix sum, and `div` keeps the
            # engine-exact arithmetic used repo-wide — double division
            # would lose exactness past 2^53 cumulative tokens.
            F.expr("cum_before div 2048").alias("pack_id"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register(
    "pipeline_domain_mix",
    oracle="""
    WITH per_source AS (
      SELECT source,
             COUNT(*) AS n_docs,
             -- CAST: integer SUM is HUGEINT in DuckDB (driver hashes
             -- HUGEINT as float64; Spark emits BIGINT).
             CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT)
               AS source_tokens
      FROM documents GROUP BY source),
    total AS (SELECT SUM(source_tokens) AS total_tokens FROM per_source),
    weighted AS (
      SELECT source, n_docs, source_tokens,
             CASE WHEN source IN ('src0', 'src1')
                  THEN CAST(0.2 AS DOUBLE)
                  ELSE CAST(0.6 AS DOUBLE) / 18 END AS target_weight
      FROM per_source)
    SELECT w.source, w.n_docs, w.source_tokens, w.target_weight,
           LEAST(CAST(1 AS DOUBLE),
                 w.target_weight * t.total_tokens / w.source_tokens)
             AS sample_rate,
           LEAST(CAST(1 AS DOUBLE),
                 w.target_weight * t.total_tokens / w.source_tokens)
             * w.source_tokens AS effective_tokens
    FROM weighted w CROSS JOIN total t
    """,
    category="pipeline",
)
def pipeline_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: given target mixture weights per
    source (here: 20% each for two up-weighted domains, the rest
    sharing 60%), derive the per-source sampling rate that realizes the
    mix within the corpus's token budget — rates cap at 1.0 (this
    operator subsamples; epoch-repeat for up-sampling is a trainer
    concern).

    The aggregate is token-weighted, not doc-weighted: mixing is about
    how many tokens the model sees. One groupBy(source) partial agg;
    the grand total joins back as a 1-row broadcast, never collected."""
    d = load_table(spark, sf_dir, "documents")
    per_source = (
        d.select("source", token_count("text").alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("source_tokens"),
        )
    )
    total = per_source.agg(F.sum("source_tokens").alias("total_tokens"))
    weight = (
        F.when(F.col("source").isin("src0", "src1"), F.lit(0.2))
        .otherwise(F.lit(0.6) / F.lit(18))
        .alias("target_weight")
    )
    rate = F.least(
        F.lit(1.0),
        F.col("target_weight")
        * F.col("total_tokens")
        / F.col("source_tokens"),
    )
    return (
        per_source.select("source", "n_docs", "source_tokens", weight)
        .join(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "source_tokens",
            "target_weight",
            rate.alias("sample_rate"),
            (rate * F.col("source_tokens")).alias("effective_tokens"),
        )
    )


# Upsampling cap: a source repeated more than this many epochs degrades
# models faster than it helps coverage (the standard small-domain
# repeat ceiling); the plan clips there and reports the shortfall.
MAX_EPOCHS = 4.0


@register(
    "pipeline_epoch_plan",
    oracle=f"""
    WITH per_source AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT)
               AS source_tokens
      FROM documents GROUP BY source),
    total AS (
      SELECT CAST(SUM(source_tokens) AS BIGINT) AS total_tokens
      FROM per_source),
    weighted AS (
      SELECT source, n_docs, source_tokens,
             CASE WHEN source IN ('src0', 'src1')
                  THEN CAST(0.2 AS DOUBLE)
                  ELSE CAST(0.6 AS DOUBLE) / 18 END AS target_weight
      FROM per_source)
    SELECT w.source, w.n_docs, w.source_tokens, w.target_weight,
           LEAST(CAST({MAX_EPOCHS} AS DOUBLE),
                 w.target_weight * t.total_tokens / w.source_tokens)
             AS epochs,
           LEAST(CAST({MAX_EPOCHS} AS DOUBLE),
                 w.target_weight * t.total_tokens / w.source_tokens)
             * w.source_tokens AS planned_tokens,
           w.target_weight * t.total_tokens / w.source_tokens
             > CAST({MAX_EPOCHS} AS DOUBLE) AS clipped
    FROM weighted w CROSS JOIN total t
    """,
    category="pipeline",
    bench=True,
)
def pipeline_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch planning — the UPSAMPLING half of domain mixing
    (``pipeline_domain_mix`` caps rates at 1.0 and subsamples; this
    operator computes how many EPOCHS of each source realize the target
    mixture when a source is too small, clipping at {MAX_EPOCHS}
    repeats — the standard ceiling past which repetition hurts — and
    flagging clipped sources so the trainer knows the realized mix
    diverges from the target).

    Same scale shape as domain_mix: one groupBy(source) partial agg
    over token counts; the grand total joins back as a 1-row broadcast,
    never collected. Arithmetic is double-on-exact-integers (token
    sums are BIGINT), identical in both engines."""
    d = load_table(spark, sf_dir, "documents")
    per_source = (
        d.select("source", token_count("text").alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("source_tokens"),
        )
    )
    total = per_source.agg(
        F.sum("source_tokens").cast("long").alias("total_tokens")
    )
    weight = (
        F.when(F.col("source").isin("src0", "src1"), F.lit(0.2))
        .otherwise(F.lit(0.6) / F.lit(18))
        .alias("target_weight")
    )
    raw_epochs = (
        F.col("target_weight")
        * F.col("total_tokens")
        / F.col("source_tokens")
    )
    epochs = F.least(F.lit(MAX_EPOCHS), raw_epochs)
    return (
        per_source.select("source", "n_docs", "source_tokens", weight)
        .join(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "source_tokens",
            "target_weight",
            epochs.alias("epochs"),
            (epochs * F.col("source_tokens")).alias("planned_tokens"),
            (raw_epochs > MAX_EPOCHS).alias("clipped"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weights (Xie et al., "Data Selection for
# Language Models via Importance Resampling"): hashed n-gram bag
# models of a target domain vs the raw corpus, per-doc importance
# log-weight, deterministic selection downstream
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256  # hashed feature space (2^k buckets; paper uses 2^16)
DSIR_LOG_SCALE = 1_000_000  # per-bucket log-ratio in 1e-6 fixed point
DSIR_TARGET_LANG = "en"  # the target domain: English-like text


@register(
    "pipeline_dsir_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS term
      FROM documents),
    feat AS (
      SELECT doc_id, lang,
             (('0x' || SUBSTR(MD5(term), 1, 15))::BIGINT) % {DSIR_BUCKETS}
               AS b
      FROM toks WHERE term <> ''),
    counts AS (
      SELECT b, COUNT(*) AS rc,
             COUNT(*) FILTER (lang = '{DSIR_TARGET_LANG}') AS tc
      FROM feat GROUP BY b),
    tots AS (
      SELECT CAST(SUM(rc) AS BIGINT) AS raw_tot,
             CAST(SUM(tc) AS BIGINT) AS tgt_tot
      FROM counts),
    lr AS (
      SELECT counts.b,
             CAST(ROUND({DSIR_LOG_SCALE} * LN(
                 CAST(counts.tc + 1 AS DOUBLE)
               * CAST(tots.raw_tot + {DSIR_BUCKETS} AS DOUBLE)
               / (CAST(counts.rc + 1 AS DOUBLE)
                  * CAST(tots.tgt_tot + {DSIR_BUCKETS} AS DOUBLE))))
               AS BIGINT) AS lw
      FROM counts CROSS JOIN tots),
    docb AS (
      SELECT doc_id, b, COUNT(*) AS c FROM feat GROUP BY doc_id, b),
    w AS (
      SELECT docb.doc_id,
             CAST(SUM(docb.c * lr.lw) AS BIGINT) AS dsir_weight,
             CAST(SUM(docb.c) AS BIGINT) AS n_tokens
      FROM docb JOIN lr USING (b) GROUP BY docb.doc_id)
    SELECT d.doc_id, d.lang, w.dsir_weight, w.n_tokens
    FROM documents d JOIN w ON d.doc_id = w.doc_id
    """,
    category="pipeline",
    bench=True,
)
def pipeline_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: estimate a hashed-unigram bag model of
    the target domain (lang = DSIR_TARGET_LANG) and of the raw corpus,
    add-one smoothed over DSIR_BUCKETS hashed features, and score each
    doc by sum(count_b * log(p_target(b)/q_raw(b))) — the importance
    log-weight that DSIR resamples by. The per-BUCKET log-ratio is
    quantized once to DSIR_LOG_SCALE fixed point (256 values; each
    count factor casts to double BEFORE multiplying, so the ratio is
    overflow-free at any corpus size and bit-identical across engines
    per the repo's ROUND(LN(..)) precedent); the per-DOC
    aggregation is then pure int64 — order-independent and
    map-side combinable, respecting registry determinism rule 2 (no
    raw double aggregates).

    Scale shape: the feature explode is a narrow map (hash % 2^k);
    bucket counts are a DSIR_BUCKETS-row aggregate (map-side combined;
    one count pass computes raw AND target via conditional count);
    the log-ratio relation is 2^k rows → broadcast; the per-doc
    weight is ONE partial-agg groupBy(doc_id). No joins wider than
    the model broadcast, no sort anywhere. Selection (top fraction /
    importance resampling) composes downstream: rank-free threshold
    via agg_quantile_hash_sample's sampled quantiles, or the
    hash_bucket Gumbel-top-k trick — never a global sort over the
    corpus. Paper-faithful deltas: unigrams not bigrams and 2^8 not
    2^16 buckets (this corpus' vocabulary is tiny); both are the same
    plan at production sizes."""
    d = load_table(spark, sf_dir, "documents")
    from iceberg_by_example_spark.operators.dedup import _md5_hash60
    from iceberg_by_example_spark.util import detach

    # ONE md5-per-token pass (r19): feat previously fed counts AND
    # docb unpinned, so the explode + hash ran twice. The per-(doc,
    # bucket) counts are pinned once; the bucket model aggregates FROM
    # them (SUM of per-doc counts = corpus counts — bit-identical,
    # order-free int64), and lang rides the groupBy (doc_id determines
    # lang) so the final corpus join disappears. A repartition before
    # the explode was committed with this change, then REVERTED on a
    # full-query interleaved A/B (fresh-JVM floors 2.03/2.10s with vs
    # consistently lower without at matched canaries): the split+md5
    # stage is too cheap here to amortize shuffling the text payload —
    # the explode's own groupBy exchange already spreads everything
    # downstream of the map stage.
    feat = (
        d.select("doc_id", "lang", "text")
        .select(
            "doc_id",
            "lang",
            F.explode(F.split("text", " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .select(
            "doc_id",
            "lang",
            (_md5_hash60(F.col("term")) % DSIR_BUCKETS).alias("b"),
        )
    )
    docb = detach(
        feat.groupBy("doc_id", "lang", "b").agg(
            F.count("*").alias("c")
        )
    )
    counts = docb.groupBy("b").agg(
        F.sum("c").alias("rc"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("c")).otherwise(
                F.lit(0)
            )
        ).alias("tc"),
    )
    tots = counts.agg(
        F.sum("rc").alias("raw_tot"), F.sum("tc").alias("tgt_tot")
    )
    # Each factor casts to double BEFORE the multiply (r9 ADVICE #2):
    # the int64 product (tc+1)*(raw_tot+B) overflows at trillion-token
    # corpora and ANSI mode errors. IEEE multiplication is correctly
    # rounded, so double(a)*double(b) == double(a*b) whenever a*b fits
    # the int64 form at all (each factor < 2^53 long before the
    # product hits 2^63) — bit-identical log-ratios at every scale the
    # old form handled, overflow-free far beyond it.
    lr = counts.join(F.broadcast(tots)).select(
        "b",
        F.round(
            F.lit(DSIR_LOG_SCALE)
            * F.ln(
                (F.col("tc") + 1).cast("double")
                * (F.col("raw_tot") + DSIR_BUCKETS).cast("double")
                / (
                    (F.col("rc") + 1).cast("double")
                    * (F.col("tgt_tot") + DSIR_BUCKETS).cast("double")
                )
            )
        )
        .cast("long")
        .alias("lw"),
    )
    return (
        docb.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("c") * F.col("lw")).alias("dsir_weight"),
            F.sum("c").alias("n_tokens"),
        )
        .select("doc_id", "lang", "dsir_weight", "n_tokens")
    )


# ---------------------------------------------------------------------------
# DSIR selection: importance resampling via Gumbel top-k
# ---------------------------------------------------------------------------

DSIR_RESAMPLE_K = 200


# Largest double strictly below 1.0: the clamp ceiling for the
# uniform. A 60-bit hash within ~64 of 2^60 rounds UP to exactly 2^60
# when cast to double, making u == 1.0; then -ln(-ln(u)) is +Infinity,
# round(inf).cast('long') saturates to Long.MaxValue, and the
# 'dsir_weight + gq' key overflows int64 (wraps non-ANSI, errors ANSI).
# Probability ~2^-54 per doc — but at trillion-doc corpora that is a
# real row, and the repo's standard is closing exactly these cliffs.
# DuckDB twin literal: 0.9999999999999999 (= 1 - 2^-53 exactly).
_GUMBEL_U_MAX = 1.0 - 2.0**-53


def _gumbel_uniform_from_hash(h60) -> "F.Column":
    """(0,1) uniform from a 60-bit integer hash column, clamped below
    1.0 — split out from ``_gumbel_uniform`` so the headroom test can
    drive the 2^60-edge hash values directly."""
    u = (h60.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    return F.least(u, F.lit(_GUMBEL_U_MAX))


def _gumbel_uniform(doc_id) -> "F.Column":
    from iceberg_by_example_spark.operators.dedup import _md5_hash60

    return _gumbel_uniform_from_hash(
        _md5_hash60(F.concat(F.lit("gumbel:"), doc_id.cast("string")))
    )


def dsir_gumbel_topk(weights: DataFrame, k: int = DSIR_RESAMPLE_K) -> DataFrame:
    """Turn DSIR importance log-weights into an actual SELECTED SUBSET
    — the second half of Xie et al. 2023 (the paper itself resamples
    with the Gumbel top-k trick, §2.2): adding independent Gumbel
    noise G_i = -ln(-ln(U_i)) to each doc's log-weight and keeping the
    k largest keys draws k docs WITHOUT replacement with probability
    proportional to exp(log-weight) (Vieira 2014, "Gumbel-max trick
    and weighted reservoir sampling" — the Efraimidis–Spirakis A-ES
    scheme in log space). No sequential reservoir state, no rejection
    loop: selection is a pure per-row key plus one top-k.

    Determinism/portability: U_i is the salted 60-bit md5 integer of
    doc_id mapped to (0,1) — ``('0x'||SUBSTR(MD5('gumbel:'||id),1,15))
    ::BIGINT`` in DuckDB — and the Gumbel value is quantized ONCE to
    DSIR_LOG_SCALE fixed point (the repo's ROUND(LN(..)) precedent),
    so the sort key is pure int64: ``dsir_weight + gq``, bit-identical
    across engines and across runs. Changing the salt re-draws the
    sample; nothing else moves.

    Scale shape: the key is a narrow map over the weights relation
    (itself one partial-agg groupBy — see ``pipeline_dsir_weights``);
    top-k by (key DESC, doc_id ASC) with the injective doc_id
    tie-break compiles to TakeOrderedAndProject — per-partition heaps
    plus a k-row driver merge, never a global sort. At 100 TB the
    selected set is usually a FRACTION, not a count: for that, swap
    the limit for a threshold on the same key against a quantile from
    ``agg_quantile_hash_sample`` — the key construction (the part
    that carries the statistics) is unchanged."""
    u = _gumbel_uniform(F.col("doc_id"))
    keyed = weights.withColumn(
        "gumbel_key",
        F.col("dsir_weight")
        + F.round(F.lit(DSIR_LOG_SCALE) * -F.ln(-F.ln(u))).cast("long"),
    )
    return keyed.orderBy(
        F.desc("gumbel_key"), F.asc("doc_id")
    ).limit(k)


@register(
    "pipeline_dsir_resample",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS term
      FROM documents),
    feat AS (
      SELECT doc_id, lang,
             (('0x' || SUBSTR(MD5(term), 1, 15))::BIGINT) % {DSIR_BUCKETS}
               AS b
      FROM toks WHERE term <> ''),
    counts AS (
      SELECT b, COUNT(*) AS rc,
             COUNT(*) FILTER (lang = '{DSIR_TARGET_LANG}') AS tc
      FROM feat GROUP BY b),
    tots AS (
      SELECT CAST(SUM(rc) AS BIGINT) AS raw_tot,
             CAST(SUM(tc) AS BIGINT) AS tgt_tot
      FROM counts),
    lr AS (
      SELECT counts.b,
             CAST(ROUND({DSIR_LOG_SCALE} * LN(
                 CAST(counts.tc + 1 AS DOUBLE)
               * CAST(tots.raw_tot + {DSIR_BUCKETS} AS DOUBLE)
               / (CAST(counts.rc + 1 AS DOUBLE)
                  * CAST(tots.tgt_tot + {DSIR_BUCKETS} AS DOUBLE))))
               AS BIGINT) AS lw
      FROM counts CROSS JOIN tots),
    docb AS (
      SELECT doc_id, b, COUNT(*) AS c FROM feat GROUP BY doc_id, b),
    w AS (
      SELECT docb.doc_id,
             CAST(SUM(docb.c * lr.lw) AS BIGINT) AS dsir_weight,
             CAST(SUM(docb.c) AS BIGINT) AS n_tokens
      FROM docb JOIN lr USING (b) GROUP BY docb.doc_id),
    weights AS (
      SELECT d.doc_id, d.lang, w.dsir_weight, w.n_tokens
      FROM documents d JOIN w ON d.doc_id = w.doc_id),
    keyed AS (
      SELECT doc_id, lang, dsir_weight, n_tokens,
             dsir_weight + CAST(ROUND({DSIR_LOG_SCALE} * -LN(-LN(LEAST(
                 ((('0x' || SUBSTR(MD5('gumbel:'
                     || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) + 0.5)
                   / 1152921504606846976.0,
                 0.9999999999999999)))) AS BIGINT) AS gumbel_key
      FROM weights)
    SELECT doc_id, lang, dsir_weight, n_tokens, gumbel_key
    FROM keyed
    ORDER BY gumbel_key DESC, doc_id
    LIMIT {DSIR_RESAMPLE_K}
    """,
    category="pipeline",
    bench=True,
)
def pipeline_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dsir_gumbel_topk`` over ``pipeline_dsir_weights`` — the full
    DSIR pipeline as one plan: hashed-unigram importance weights, then
    a k-doc importance resample without replacement, p ∝ exp(weight).
    The oracle is compositional: the registered DSIR weights CTE chain
    plus the one-line Gumbel key (salted 60-bit md5 uniform, clamped
    at 1 - 2^-53 so -ln(-ln(u)) can never be +Inf, quantized ONCE to
    DSIR_LOG_SCALE fixed point), ordered by (gumbel_key DESC, doc_id)
    LIMIT k. The int64 key makes the top-k bit-identical across
    engines; the injective doc_id tie-break makes the selected SET
    unique. Spark plan: TakeOrderedAndProject over the one-groupBy
    weights relation — per-partition heaps plus a k-row driver merge,
    never a global sort, no new shuffle beyond the weights agg."""
    return dsir_gumbel_topk(pipeline_dsir_weights(spark, sf_dir))


# ---------------------------------------------------------------------------
# Temperature-scaled mixture: the multilingual/multi-domain alpha knob
# ---------------------------------------------------------------------------

MIX_ALPHA = 0.3  # the standard multilingual sampling temperature
MIX_POW_SCALE = 1_000_000  # n^alpha quantized to 1e-6 fixed point


def _mix_pow(per_source: DataFrame, alpha: float = MIX_ALPHA) -> DataFrame:
    """``per_source`` plus the quantized temperature power ``pow_q =
    ROUND(1e6 · n^alpha)`` in DECIMAL(38,0) (zero-token sources at
    exactly 0) — the shared exact-integer core behind
    ``temperature_mix_rates``'s shares and the curation pipeline's
    per-source quotas."""
    return per_source.withColumn(
        "pow_q",
        F.when(
            F.col("source_tokens") > 0,
            F.round(
                F.lit(MIX_POW_SCALE)
                * F.exp(
                    F.lit(alpha) * F.ln(F.col("source_tokens").cast("double"))
                )
            ).cast("decimal(38,0)"),
        ).otherwise(F.lit(0).cast("decimal(38,0)")),
    )


def temperature_mix_rates(per_source: DataFrame, alpha: float = MIX_ALPHA) -> DataFrame:
    """Temperature-scaled mixture shares: p_i ∝ n_i^alpha over the
    per-source token counts — the exponent knob from the multilingual
    pre-training literature (mBERT/XLM-R's exponential smoothing,
    alpha = 0.3; UniMax is the same family with an epoch cap, which
    this repo already implements as ``pipeline_epoch_plan``). alpha = 1
    reproduces the natural (token-proportional) mix; alpha → 0
    approaches uniform-by-source; in between, small domains are
    up-weighted smoothly without the cliff of a hand-set target table
    (``pipeline_domain_mix``'s input).

    Determinism: n_i^alpha is computed per SOURCE (a handful of rows,
    not per doc) and quantized once to MIX_POW_SCALE fixed point —
    ``ROUND(1e6 * EXP(alpha * LN(n)))`` — so the normalizing sum is
    pure int64 and the shares are exact integer ratios cast at the
    end; bit-identical across engines and partitionings (registry
    determinism rule 2).

    Scale shape: one map-side-combined groupBy(source) over the
    corpus, then all arithmetic happens on the sources relation
    (hundreds of rows at most) with the 1-row grand total joined back
    as a broadcast. Nothing downstream of the first aggregate ever
    touches data again. Expects columns (source, source_tokens);
    returns shares plus the boost factor vs the natural mix.

    Edge contracts (r10 ADVICE #2): a ZERO-token source gets pow_q 0
    and share 0 explicitly — without the guard, ln(0) is NULL, the
    NULL pow_q silently vanishes from SUM's normalizing total, and the
    source disappears from the mix instead of being reported at share
    0. Overflow envelope: pow_q = round(1e6 * n^alpha) fits int64 iff
    n^alpha < ~9.2e12, i.e. n < (9.2e12)^(1/alpha) — at the default
    alpha 0.3 that is ~10^43 tokens (unreachable); alpha >= ~0.72 can
    cross the cliff on a >=10-quadrillion-token source, so past the
    guard below the quantized power is computed in DECIMAL(38,0),
    whose 38 digits hold 1e6 * n^alpha for every alpha <= 1 at any
    int64-countable n (n <= 2^63 → 1e6 * n < 10^26). The sum of
    hundreds of DECIMAL(38,0) rows stays exact; shares divide as
    double at the end as before."""
    powed = _mix_pow(per_source, alpha)
    tot = powed.agg(
        F.sum("pow_q").alias("pow_tot"),
        F.sum("source_tokens").alias("tok_tot"),
    )
    nat = F.col("source_tokens").cast("double") / F.col("tok_tot")
    tmp = F.col("pow_q").cast("double") / F.col("pow_tot").cast("double")
    return (
        powed.join(F.broadcast(tot))
        .select(
            "source",
            "source_tokens",
            nat.alias("natural_share"),
            tmp.alias("temp_share"),
            # 0-token sources have no natural share; boost is NULL (not
            # 0/0 = NaN, which would poison downstream comparisons).
            F.when(F.col("source_tokens") > 0, tmp / nat).alias("boost"),
        )
    )


# Registration-ready DuckDB twin, mirroring the r11 semantics exactly:
# pow_q in DECIMAL(38,0) (the alpha<=1 overflow-free envelope), zero-
# token sources at pow_q 0 / share 0 / boost NULL, shares as double
# divisions of exact integers (bit-identical across engines).
_TEMPERATURE_MIX_ORACLE = f"""
    WITH per_source AS (
      SELECT source,
             CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT)
               AS source_tokens
      FROM documents GROUP BY source),
    powed AS (
      SELECT source, source_tokens,
             CASE WHEN source_tokens > 0
                  THEN CAST(ROUND({MIX_POW_SCALE} * EXP(
                         {MIX_ALPHA} * LN(CAST(source_tokens AS DOUBLE))))
                       AS DECIMAL(38,0))
                  ELSE CAST(0 AS DECIMAL(38,0)) END AS pow_q
      FROM per_source),
    tot AS (
      SELECT SUM(pow_q) AS pow_tot,
             CAST(SUM(source_tokens) AS BIGINT) AS tok_tot
      FROM powed)
    SELECT source, source_tokens,
           CAST(source_tokens AS DOUBLE) / tok_tot AS natural_share,
           CAST(pow_q AS DOUBLE) / CAST(pow_tot AS DOUBLE) AS temp_share,
           CASE WHEN source_tokens > 0
                THEN (CAST(pow_q AS DOUBLE) / CAST(pow_tot AS DOUBLE))
                     / (CAST(source_tokens AS DOUBLE) / tok_tot)
                END AS boost
    FROM powed CROSS JOIN tot
"""


def pipeline_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``temperature_mix_rates`` over the documents table's per-source
    token counts. Unregistered (r11's registry slot went to
    ``pipeline_dsir_resample``; queued behind
    ``dedup_incremental_winnow``); registration-ready —
    ``_TEMPERATURE_MIX_ORACLE`` above is the DuckDB twin, pytest pins
    row-identical output."""
    d = load_table(spark, sf_dir, "documents")
    per_source = (
        d.select("source", token_count("text").alias("n_tokens"))
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("source_tokens"))
    )
    return temperature_mix_rates(per_source)


# ---------------------------------------------------------------------------
# Deterministic global corpus shuffle: the order-randomization step
# between curation and sequence packing
# ---------------------------------------------------------------------------

SHUFFLE_SHARDS = 64  # 2^6 shards; production sizes this to the cluster
# exact power-of-two split of the 60-bit keyspace: shard = k div WIDTH
SHUFFLE_SHARD_WIDTH = (1 << 60) // SHUFFLE_SHARDS


def shuffle_key(doc_id) -> "F.Column":
    """The deterministic global-shuffle key: salted 60-bit md5 of the
    doc id — shared by ``pipeline_global_shuffle`` and the curation
    pipeline's temperature-quota selection, so 'random order' means
    the SAME order everywhere it is consumed."""
    from iceberg_by_example_spark.operators.dedup import _md5_hash60

    return _md5_hash60(
        F.concat(F.lit("shuf:"), doc_id.cast("string"))
    )

# Registration-ready DuckDB twin (a future registry slot is one
# decorator away): identical salted 60-bit key, identical power-of-two
# shard split, identical within-shard rank.
_GLOBAL_SHUFFLE_ORACLE = f"""
    WITH keyed AS (
      SELECT doc_id, source,
             ('0x' || SUBSTR(MD5('shuf:' || CAST(doc_id AS VARCHAR)),
                             1, 15))::BIGINT AS k
      FROM documents)
    SELECT doc_id, source,
           k // {(1 << 60) // SHUFFLE_SHARDS} AS shard,
           ROW_NUMBER() OVER (
             PARTITION BY k // {(1 << 60) // SHUFFLE_SHARDS}
             ORDER BY k, doc_id) AS pos
    FROM keyed
"""


def pipeline_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle of the corpus — the
    order-randomization every training pipeline runs between curation
    and packing, WITHOUT `rand()` (not reproducible) and WITHOUT a
    global sort (not scalable): each doc gets a salted 60-bit md5 key;
    the top bits split the keyspace into SHUFFLE_SHARDS equal hash
    ranges (`k div 2^54` — an exact power-of-two split, no sampling);
    within a shard, position = row_number by (k, doc_id). The total
    order is (shard, pos) lexicographic and equals ORDER BY (k,
    doc_id) exactly — but no task ever sees more than one shard.

    This is the same physical shape Spark's own orderBy produces
    (range partition + local sort) with one decisive difference at
    100 TB: the range boundaries are FIXED arithmetic, not sampled, so
    the assignment of every document is bit-stable across runs,
    cluster sizes, and AQE decisions — a training run can be resumed
    or re-sharded and every sequence lands where it did before.
    Feeding ``pipeline_pack_sequences`` with (shard, pos) as the
    packing order (instead of raw doc_id) yields shuffled-but-
    reproducible training sequences; at production scale set
    SHUFFLE_SHARDS so a shard's rows fit one task comfortably (the
    within-shard window is the only per-shard serial work).

    Unregistered this round (r11's slot went to
    ``pipeline_dsir_resample``); ``_GLOBAL_SHUFFLE_ORACLE`` is the
    DuckDB twin, and pytest pins shard balance, the exact equality of
    (shard, pos) order with the brute-force global key order, and
    partitioning invariance."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id", "source", shuffle_key(F.col("doc_id")).alias("k")
    )
    # `div`, not cast-after-/: float division then cast would round
    # the quotient; div is the exact integral quotient in both engines
    shard = F.expr(f"k div {SHUFFLE_SHARD_WIDTH}")
    pos = F.row_number().over(
        Window.partitionBy(shard).orderBy(F.asc("k"), F.asc("doc_id"))
    )
    return keyed.select(
        "doc_id",
        "source",
        shard.alias("shard"),
        pos.alias("pos"),
    )


def pipeline_pack_learned(
    spark: SparkSession, sf_dir: str, **bpe_kw
) -> DataFrame:
    """Sequence packing under the LEARNED token budget — the
    tokenizer-side train→apply closure: the registered packer budgets
    by whitespace tokens, but a training run's 2048-token sequences
    are measured in TOKENIZER pieces, so this variant trains the BPE
    on the corpus (``bpe_tokenize_stats`` — head/tail split, driver
    merge loop on the bounded word table) and packs by each doc's
    exact learned piece count. Same streaming-concatenation
    ``pack_stats`` core, same (source, doc_id) order — only the size
    column changes, so any pack whose docs tokenize fatter than their
    whitespace count shifts boundaries exactly as production packing
    would.

    Scale shape: the tokenizer pass is the measured
    ``text_bpe_tokenize`` cost (corpus explode + broadcast head join +
    distinct-OOV pandas tail); packing adds one per-source window over
    the (doc_id, n_pieces) manifest — no second corpus read
    (``bpe_tokenize_stats`` returns a detached manifest). Bench-only;
    pytest pins equality with a pure-Python pack over the
    already-pinned per-doc piece counts, and pins that a capped-vocab
    training (multi-piece OOV words) actually moves pack boundaries
    (at the fully-trained default on the narrow test vocabulary every
    word encodes to one piece, so learned == whitespace packs there —
    corpus-specific, not structural). ``bpe_kw`` passes through to
    the trainer (n_merges, vocab_cap)."""
    from iceberg_by_example_spark.operators.tokenizer import (
        bpe_tokenize_stats,
    )
    from iceberg_by_example_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents")
    pieces = bpe_tokenize_stats(docs, **bpe_kw).select(
        "doc_id", "n_pieces"
    )
    sized = (
        docs.select("doc_id", "source")
        .join(pieces, "doc_id")
        .select(
            "doc_id", "source", F.col("n_pieces").alias("n_tokens")
        )
    )
    return pack_stats(sized, ["source"], ["doc_id"])
