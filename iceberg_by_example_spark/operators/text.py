"""Text-analysis operators over the ``documents`` table (north-star
extension; gap §2.13 — the reference has no string functions at all).

Language ID, quality scoring, token statistics, and fingerprinting —
each a pure column-expression pipeline (no Python in the hot path) with
a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_by_example_spark.functions.text import (
    STOPWORDS,
    fingerprint,
    normalize,
    stopword_hits,
    token_count,
    tokens,
)
from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table
from iceberg_by_example_spark.util import detach


def _sql_stop_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t IN ({words})))"


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id, lang, source,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
           LENGTH(text) AS n_chars_actual,
           LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_distinct_tokens,
           (LENGTH(text) - LEN(STRING_SPLIT(text, ' ')) + 1)
             / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS avg_token_len
    FROM documents
    """,
    category="text",
    bench=True,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct types, mean token
    length — the unit economics of a training-data pipeline."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = token_count("text")
    return d.select(
        "doc_id",
        "lang",
        "source",
        n_tok.alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.size(F.array_distinct(tokens("text"))).alias("n_distinct_tokens"),
        (
            (F.length("text") - n_tok + 1) / n_tok.cast("double")
        ).alias("avg_token_len"),
    )


@register(
    "text_langid",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_sql_stop_hits('en')} AS hits_en,
             {_sql_stop_hits('es')} AS hits_es,
             {_sql_stop_hits('de')} AS hits_de,
             {_sql_stop_hits('fr')} AS hits_fr,
             {_sql_stop_hits('zh')} AS hits_zh
      FROM documents)
    SELECT doc_id, lang,
           CASE WHEN GREATEST(hits_en, hits_es, hits_de, hits_fr, hits_zh) = 0 THEN 'und'
                WHEN hits_en >= GREATEST(hits_es, hits_de, hits_fr, hits_zh) THEN 'en'
                WHEN hits_es >= GREATEST(hits_de, hits_fr, hits_zh) THEN 'es'
                WHEN hits_de >= GREATEST(hits_fr, hits_zh) THEN 'de'
                WHEN hits_fr >= hits_zh THEN 'fr'
                ELSE 'zh' END AS predicted_lang,
           hits_en, hits_es, hits_de, hits_fr, hits_zh
    FROM scored
    """,
    category="text",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (n-gram heuristic family): score
    each language's stopword hits, argmax with a fixed tie-break order.
    One pass, no shuffle, no UDF."""
    d = load_table(spark, sf_dir, "documents")
    hits = {lang: stopword_hits("text", lang) for lang in STOPWORDS}
    scored = d.select(
        "doc_id",
        "lang",
        *[hits[lang].alias(f"hits_{lang}") for lang in STOPWORDS],
    )
    h = {lang: F.col(f"hits_{lang}") for lang in STOPWORDS}
    predicted = (
        F.when(
            F.greatest(h["en"], h["es"], h["de"], h["fr"], h["zh"]) == 0, "und"
        )
        .when(h["en"] >= F.greatest(h["es"], h["de"], h["fr"], h["zh"]), "en")
        .when(h["es"] >= F.greatest(h["de"], h["fr"], h["zh"]), "es")
        .when(h["de"] >= F.greatest(h["fr"], h["zh"]), "de")
        .when(h["fr"] >= h["zh"], "fr")
        .otherwise("zh")
    )
    return scored.select(
        "doc_id",
        "lang",
        predicted.alias("predicted_lang"),
        *[F.col(f"hits_{lang}") for lang in STOPWORDS],
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
             LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_distinct,
             {_sql_stop_hits('en')} AS stop_hits,
             LENGTH(text) AS n_chars
      FROM documents)
    SELECT doc_id, n_tokens,
           n_distinct / CAST(n_tokens AS DOUBLE) AS type_token_ratio,
           stop_hits / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
           LEAST(n_tokens / 256.0, 1.0) AS length_score,
           0.5 * (n_distinct / CAST(n_tokens AS DOUBLE))
             + 0.2 * (stop_hits / CAST(n_tokens AS DOUBLE))
             + 0.3 * LEAST(n_tokens / 256.0, 1.0) AS quality_score
    FROM m
    """,
    category="text",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality heuristic: lexical diversity +
    stopword plausibility + length saturation (the pre-training filter
    shape). Identical formula text on both engines → identical doubles."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = token_count("text")
    n_distinct = F.size(F.array_distinct(tokens("text")))
    stop = stopword_hits("text", "en")
    m = d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        stop.alias("stop_hits"),
    )
    ttr = F.col("n_distinct") / F.col("n_tokens").cast("double")
    swr = F.col("stop_hits") / F.col("n_tokens").cast("double")
    length_score = F.least(F.col("n_tokens") / 256.0, F.lit(1.0))
    return m.select(
        "doc_id",
        "n_tokens",
        ttr.alias("type_token_ratio"),
        swr.alias("stopword_ratio"),
        length_score.alias("length_score"),
        (0.5 * ttr + 0.2 * swr + 0.3 * length_score).alias("quality_score"),
    )


@register(
    "text_rolling_fingerprint",
    oracle="""
    SELECT doc_id,
           LIST_REDUCE(
             LIST_PREPEND(CAST(0 AS BIGINT),
               LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                 t -> ('0x' || SUBSTR(MD5(t), 1, 8))::BIGINT)),
             (acc, x) -> (acc * 1000003 + x) % 2147483647
           ) AS rolling_fp,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens
    FROM documents
    """,
    category="text",
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint (Rabin–Karp
    polynomial over token hashes): h ← (h·B + hash(tok)) mod p. Unlike
    the md5 content fingerprint this form extends incrementally — the
    streaming/chunking fingerprint family. Token hashes come from the
    first 8 md5 hex digits so both engines fold the identical integer
    sequence (xxhash has no DuckDB twin); all arithmetic stays below
    2^52, ANSI-safe. One ``F.aggregate`` over the pre-split token
    array, zero shuffles, zero UDFs."""
    d = load_table(spark, sf_dir, "documents")
    B, P = 1000003, 2147483647
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast(
        "long"
    )
    rolling = F.aggregate(
        tokens("text"),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * B + tok_hash(t)) % P,
    )
    return d.select(
        "doc_id",
        rolling.alias("rolling_fp"),
        token_count("text").alias("n_tokens"),
    )


@register(
    "text_bpe_token_estimate",
    oracle="""
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' ')) AS n_ws_tokens,
           LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+')) AS n_word_pieces,
           COALESCE(CAST(LIST_SUM(LIST_TRANSFORM(
               REGEXP_EXTRACT_ALL(text, '[A-Za-z]+'),
               w -> CAST(CEIL(LENGTH(w) / 4.0) AS BIGINT))) AS BIGINT), 0)
             AS n_subword_est,
           LEN(REGEXP_EXTRACT_ALL(text, '[0-9]|[^A-Za-z0-9 ]')) AS n_other,
           COALESCE(CAST(LIST_SUM(LIST_TRANSFORM(
               REGEXP_EXTRACT_ALL(text, '[A-Za-z]+'),
               w -> CAST(CEIL(LENGTH(w) / 4.0) AS BIGINT))) AS BIGINT), 0)
             + LEN(REGEXP_EXTRACT_ALL(text, '[0-9]|[^A-Za-z0-9 ]'))
             AS bpe_token_estimate
    FROM documents
    """,
    category="text",
)
def text_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting without a tokenizer model: alphabetic
    runs contribute ceil(len/4) subword pieces (the ~4-chars-per-token
    heuristic of byte-pair vocabularies), digits and punctuation one
    token each — the budget estimator a data pipeline runs over a
    corpus before paying for real tokenization. Pure regexp + array
    aggregation, JVM-side end to end; DuckDB twin uses the identical
    patterns (CEIL casts guarded: Spark CEIL→BIGINT, DuckDB→DOUBLE)."""
    d = load_table(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all("text", F.lit("[A-Za-z]+"), F.lit(0))
    subword = F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0),
    )
    other = F.regexp_count("text", F.lit("[0-9]|[^A-Za-z0-9 ]"))
    return d.select(
        "doc_id",
        token_count("text").alias("n_ws_tokens"),
        F.size(pieces).alias("n_word_pieces"),
        subword.alias("n_subword_est"),
        other.alias("n_other"),
        (subword + other).alias("bpe_token_estimate"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           MD5(REGEXP_REPLACE(TRIM(LOWER(text)), ' +', ' ', 'g')) AS fp,
           SUBSTR(MD5(REGEXP_REPLACE(TRIM(LOWER(text)), ' +', ' ', 'g')), 1, 8) AS fp_prefix
    FROM documents
    """,
    category="text",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (md5 — bit-identical across
    engines; the exact-dedup key)."""
    d = load_table(spark, sf_dir, "documents")
    fp = fingerprint("text")
    return d.select(
        "doc_id",
        fp.alias("fp"),
        F.substring(fp, 1, 8).alias("fp_prefix"),
    )


@register(
    "text_redact",
    oracle="""
    SELECT doc_id,
           LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]{8,}')) AS n_redacted,
           LENGTH(REGEXP_REPLACE(text, '[A-Za-z]{8,}', '<redacted>', 'g'))
             AS redacted_chars,
           REGEXP_REPLACE(text, '[A-Za-z]{8,}', '<redacted>', 'g')
             AS redacted_text
    FROM documents
    """,
    category="text",
)
def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern redaction — the scrubbing primitive of a training-data
    pipeline (PII patterns like emails/phones/SSNs plug in here as the
    pattern; the synthetic corpus has no digits, so the demo pattern
    redacts long alphabetic runs to exercise the machinery end to end).
    Count + replace are both JVM regexp expressions over the scan — a
    scrub pass at 100 TB is exactly one narrow map stage, no shuffle.
    Both engines run greedy leftmost matching on the same RE2-compatible
    pattern, so replacements align byte-for-byte."""
    d = load_table(spark, sf_dir, "documents")
    pattern = "[A-Za-z]{8,}"
    red = F.regexp_replace("text", pattern, "<redacted>")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(pattern)).alias("n_redacted"),
        F.length(red).alias("redacted_chars"),
        red.alias("redacted_text"),
    )


@register(
    "text_tfidf_topterms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term
      FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM toks WHERE term <> '' GROUP BY doc_id, term),
    docfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, docfreq.df,
             CAST(tf.tf * (n.n_docs - docfreq.df) AS BIGINT) AS score
      FROM tf JOIN docfreq USING (term) CROSS JOIN n),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, term) AS rk
      FROM scored)
    SELECT doc_id, term, tf, df, score, rk FROM ranked WHERE rk <= 3
    """,
    category="text",
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinguishing terms per document — the tf-idf idiom with
    an integer rarity weight.  Instead of ``tf * ln(N/df)`` (whose last
    float ulp differs between libm implementations, breaking the
    cross-engine hash), the score is ``tf * (N - df)`` — a pure-integer
    rarity weight that preserves the "frequent here, rare elsewhere"
    ordering and is bit-identical everywhere.

    Scale shape: explode → (doc_id, term) partial-agg (map-side
    combine) → term-keyed df agg; N crosses in as a 1-row broadcast
    (never collected); final top-k is one window shuffle on doc_id.
    The df relation is vocabulary-sized, so its join back to tf is
    broadcast-eligible under AQE at any corpus size where the
    vocabulary fits an executor (true even at 100 TB for natural
    language)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(docfreq, "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf") * (F.col("n_docs") - F.col("df")))
            .cast("long")
            .alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 3
    )


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive windows


@register(
    "text_chunk_windows",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS t,
             LEN(STRING_SPLIT(text, ' ')) AS n
      FROM documents),
    counted AS (
      SELECT doc_id, t, n,
             1 + CAST(FLOOR(GREATEST(n - {CHUNK_TOKENS}, 0)
                            / {CHUNK_STRIDE}.0) AS BIGINT)
               + CASE WHEN GREATEST(n - {CHUNK_TOKENS}, 0)
                           % {CHUNK_STRIDE} > 0 THEN 1 ELSE 0 END
               AS n_chunks
      FROM toks),
    chunks AS (
      SELECT doc_id, n, UNNEST(GENERATE_SERIES(0, n_chunks - 1)) AS chunk_id
      FROM counted)
    SELECT c.doc_id, c.chunk_id,
           c.chunk_id * {CHUNK_STRIDE} AS start_token,
           LEAST({CHUNK_TOKENS}, c.n - c.chunk_id * {CHUNK_STRIDE})
             AS chunk_tokens,
           ARRAY_TO_STRING(t.t[c.chunk_id * {CHUNK_STRIDE} + 1 :
                               c.chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}],
                           ' ') AS chunk_text
    FROM chunks c JOIN toks t USING (doc_id)
    """,
    category="text",
    bench=True,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the RAG/pre-training
    preprocessing step that turns documents into model-sized passages
    (64-token windows, 48-token stride → 16 tokens of overlap so no
    boundary sentence is ever lost). Chunk count per doc covers every
    token: the last window is short rather than dropped.

    Shape: tokenize once, explode one small index array per doc (the
    chunk ids), slice the token array per chunk — data grows only by
    the overlap factor (~4/3), all inside codegen, no shuffle at all;
    at 100 TB chunking is a pure map stage that pipelines into the
    embedding batch that follows it."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", tokens("text").alias("t"), token_count("text").alias("n")
    )
    overflow = F.greatest(F.col("n") - CHUNK_TOKENS, F.lit(0))
    n_chunks = (
        F.lit(1)
        + F.floor(overflow / float(CHUNK_STRIDE)).cast("long")
        + F.when(overflow % CHUNK_STRIDE > 0, 1).otherwise(0)
    )
    chunks = toks.select(
        "doc_id",
        "t",
        "n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * CHUNK_STRIDE
    return chunks.select(
        "doc_id",
        "chunk_id",
        start.alias("start_token"),
        F.least(F.lit(CHUNK_TOKENS), F.col("n") - start).alias("chunk_tokens"),
        F.array_join(
            F.slice("t", start + 1, CHUNK_TOKENS), " "
        ).alias("chunk_text"),
    )


# Gopher-style repetition thresholds (the published quality-filter
# family): a doc whose duplicate-token fraction or top-bigram share
# exceeds these is repetition-degenerate (looping generation, scraped
# boilerplate chains, keyword stuffing) and excluded from training.
REP_DUP_TOKEN_MAX = 0.55
REP_TOP_BIGRAM_MAX = 0.10


@register(
    "text_repetition_stats",
    oracle=f"""
    WITH tok AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
    base AS (
      SELECT doc_id, CAST(LEN(t) AS BIGINT) AS n_tokens,
             LEN(LIST_DISTINCT(t)) AS n_distinct
      FROM tok),
    bg AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
      FROM tok, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(t) - 1)) AS i)
      WHERE LEN(t) >= 2),
    bgc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    top AS (
      SELECT doc_id, MAX(c) AS top_c, CAST(SUM(c) AS BIGINT) AS n_bigrams
      FROM bgc GROUP BY 1)
    SELECT b.doc_id, b.n_tokens,
           1 - b.n_distinct / CAST(b.n_tokens AS DOUBLE) AS dup_token_frac,
           t.top_c / CAST(t.n_bigrams AS DOUBLE) AS top_bigram_frac,
           (1 - b.n_distinct / CAST(b.n_tokens AS DOUBLE))
             > {REP_DUP_TOKEN_MAX}
           OR t.top_c / CAST(t.n_bigrams AS DOUBLE) > {REP_TOP_BIGRAM_MAX}
             AS flagged
    FROM base b JOIN top t USING (doc_id)
    """,
    category="text",
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition filter, the published
    repetition-signal family: duplicate-token fraction
    (1 − |distinct| / |tokens|) and the most-frequent-bigram share of
    all bigrams, with the union-of-thresholds flag. Complements the
    INTER-document dedup operators — a looping doc is useless for
    training even when it is globally unique.

    Scale shape: the distinct-token side is a pure per-row expression
    (array_distinct over the token array — zero shuffle); the bigram
    mode needs a (doc_id, bigram) partial-count then a per-doc MAX —
    two map-side-combinable aggregations on narrow keys. The bigram
    explode is transient; text never enters a shuffle. Fractions are
    exact-integer ratios evaluated in double — identical in both
    engines."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", tokens("text").alias("t"))
    base = tok.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
    )
    bg = tok.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            )
        ).alias("bigram"),
    )
    top = (
        bg.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("top_c"),
            F.sum("c").alias("n_bigrams"),
        )
    )
    dup_frac = 1 - F.col("n_distinct") / F.col("n_tokens").cast("double")
    top_frac = F.col("top_c") / F.col("n_bigrams").cast("double")
    return base.join(top, "doc_id").select(
        "doc_id",
        "n_tokens",
        dup_frac.alias("dup_token_frac"),
        top_frac.alias("top_bigram_frac"),
        (
            (dup_frac > REP_DUP_TOKEN_MAX)
            | (top_frac > REP_TOP_BIGRAM_MAX)
        ).alias("flagged"),
    )


# Feature-hashing dimensionality (the "hashing trick"): token →
# portable-hash bucket, counts accumulated per bucket. 64 keeps the
# demo readable; production uses 2^18+ where collisions are noise.
HASHING_DIM = 64


def hashing_feature_frame(
    docs: DataFrame, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, [carry...,] features: array<int>) over ANY
    documents-shaped frame — batch or streaming — so the trainer, the
    batch scorer, and the online stream scorer all featurize through
    the SAME expressions and can never drift. ``carry`` names extra
    columns to ride along (e.g. the trainer's label) — free here,
    where a downstream join back to the corpus would cost an exchange
    per side (the ``_shingle_sets`` carry idiom). Placement (e.g. a
    repartition before the md5-per-token stage) is the CALLER's
    choice: the batch trainer spreads its corpus, the stream scorer
    must not reshuffle its micro-batches."""
    from iceberg_by_example_spark.operators.dedup import _md5_hash60

    buckets = F.transform(
        tokens("text"), lambda t: _md5_hash60(t) % HASHING_DIM
    )
    tok = docs.select("doc_id", *carry, buckets.alias("b"))

    def _eq(k: int):
        # single-arg lambda: a 2-arg function would make F.filter pass
        # the ARRAY INDEX as the second argument
        return lambda x: x == F.lit(k)

    features = F.array(
        *[F.size(F.filter("b", _eq(k))) for k in range(HASHING_DIM)]
    )
    return tok.select("doc_id", *carry, features.alias("features"))


def hashing_logit_micro(docs: DataFrame, w: list) -> DataFrame:
    """(doc_id, z) where z = w · x for the hashing-trick features of
    ``hashing_feature_frame`` — computed WITHOUT materializing the
    DIM-width count vector: since x[k] counts the tokens hashing to
    bucket k, w · x = Σ_tokens w[bucket(token)] by distributivity,
    one exact int64 fold over the token array (the same ``tokens`` /
    ``_md5_hash60 % HASHING_DIM`` mapping the featurizer uses, so the
    two forms cannot drift — pinned equal by pytest). The count-vector
    form builds DIM per-row filter scans (DIM × tokens comparisons
    per doc and a ~DIM-expression tree the driver pays to construct
    per query); the fold is one hash + one array lookup per token.
    r20: the scorer paths (``score_doc_stream`` → daily-ingest
    lr_keep gate, stream scoring) switched to this; the TRAINER keeps
    the count vector, which its per-bucket gradients genuinely need."""
    from iceberg_by_example_spark.operators.dedup import _md5_hash60

    w_arr = F.array(*[F.lit(int(v)).cast("long") for v in w])
    z = F.aggregate(
        tokens("text"),
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.get(w_arr, (_md5_hash60(t) % HASHING_DIM).cast("int")),
    )
    return docs.select("doc_id", z.alias("z"))


def hashing_vectorizer_arrays(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Array-shaped hashing-trick features (``features:
    array<int>``) — the native form a trainer consumes. Unregistered:
    the grading driver cannot hash array cells (registry rule 4), so
    the registered query below canonicalizes to a string."""
    return hashing_feature_frame(load_table(spark, sf_dir, "documents"))


@register(
    "text_hashing_vectorizer",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             LIST_TRANSFORM(STRING_SPLIT(text, ' '),
               t -> ('0x' || SUBSTR(MD5(t), 1, 15))::BIGINT
                    % {HASHING_DIM}) AS b
      FROM documents)
    SELECT doc_id,
           ARRAY_TO_STRING(
             [LEN(LIST_FILTER(b, x -> x = k))
              for k in generate_series(0, {HASHING_DIM - 1})],
             ',') AS features
    FROM tok
    """,
    category="text",
)
def text_hashing_vectorizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: each document becomes a fixed-width token-
    count vector with bucket = portable_hash(token) mod DIM — the
    stateless featurizer (no vocabulary to build, broadcast, or keep
    consistent across runs) behind linear classifiers and cheap
    similarity pre-filters. Uses the same ``_md5_hash60`` family as
    the minhash pipeline, so the oracle reproduces the exact vectors.
    The vector is emitted as ONE comma-joined string per registry
    rule 4 (the driver's pandas hasher cannot hash list cells);
    ``hashing_vectorizer_arrays`` above keeps the array shape.

    Scale shape: pure per-row column expressions — tokenize once,
    hash once per token, DIM in-row filters — inside whole-stage
    codegen; no shuffle, no state, nothing grows with corpus size
    but the scan."""
    arr = hashing_vectorizer_arrays(spark, sf_dir)
    return arr.select(
        "doc_id",
        F.array_join(
            F.transform("features", lambda x: x.cast("string")), ","
        ).alias("features"),
    )


# Trigram-LM quality scoring: the KenLM-filter shape with the
# transcendental parts removed. Production pipelines score documents
# with a small n-gram language model and drop the high-perplexity
# tail; the signal that survives the LM is "how much of this document
# is made of n-grams the training corpus has (rarely or never) seen".
# That mass is computable in exact integer arithmetic — no logs, so
# the whole path stays bit-identical across engines (log-space scores
# differ in the last ulp between libm implementations).
TRI_N = 3
TRI_RARE_DF = 3  # train count < this ⇒ "rare"
_TRAIN_BUCKET = "cd"  # ~80% of docs train the model (split_hash idiom)


@register(
    "text_lm_rare_mass",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS t,
             SUBSTR(MD5('lm:' || CAST(doc_id AS VARCHAR)), 1, 2)
               < '{_TRAIN_BUCKET}' AS is_train
      FROM documents),
    tri AS (
      SELECT doc_id, is_train,
             ARRAY_TO_STRING(t[i:i+{TRI_N - 1}], ' ') AS g
      FROM tok, LATERAL (SELECT UNNEST(GENERATE_SERIES(
             1, LEN(t) - {TRI_N - 1}, 1)) AS i)
      WHERE LEN(t) >= {TRI_N}),
    model AS (
      SELECT g, COUNT(*) AS cnt FROM tri WHERE is_train GROUP BY g),
    scored AS (
      SELECT tri.doc_id, tri.g, COALESCE(model.cnt, 0) AS cnt
      FROM tri LEFT JOIN model ON tri.g = model.g)
    SELECT doc_id,
           COUNT(*) AS n_tri,
           CAST(SUM(CASE WHEN cnt = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(SUM(CASE WHEN cnt < {TRI_RARE_DF} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_rare,
           CAST(SUM(CASE WHEN cnt < {TRI_RARE_DF} THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*) AS rare_ratio
    FROM scored GROUP BY doc_id
    """,
    category="text",
)
def text_lm_rare_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram language-model quality score, integer-exact: train a
    token-trigram count model on the deterministic ~80% train split
    (salted-md5 membership, the ``pipeline_split_hash`` idiom), then
    score EVERY document by its out-of-vocabulary and rare trigram
    mass — ``n_oov`` (train count 0), ``n_rare`` (train count <
    {TRI_RARE_DF}), and the rare fraction. High rare mass is the
    high-perplexity tail a KenLM filter would drop; counts replace
    log-probabilities so the score is bit-reproducible cross-engine
    (a single IEEE division at the end, same-operand in both).
    Documents shorter than {TRI_N} tokens have no trigrams and are
    excluded (they go to a length filter, not an LM filter).

    Scale shape: trigrams are a map-side transform (no token-level
    explode-then-join-back); the model is a hash groupBy whose size is
    vocabulary-bound (trigram types, not instances — Zipf keeps this
    far below corpus size); scoring is one hash join on the trigram
    string and one per-doc aggregate. At 100 TB the model table
    shards like any dimension and the join broadcasts when the
    vocabulary fits — nothing is ever pairwise."""
    d = load_table(spark, sf_dir, "documents")
    # repartition-before-tokenize (the _shingle_sets policy): the
    # trigram construction (an array_join per token position) is the
    # CPU stage and both the model and scoring passes re-derive it
    # from this subtree — projected before the exchange it would run
    # at the scan's (possibly single-file) parallelism
    n = spark.sparkContext.defaultParallelism
    tok = (
        d.select("doc_id", "text")
        .repartition(n, "doc_id")
        .select(
            "doc_id",
            tokens("text").alias("t"),
            (
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("lm:"), F.col("doc_id").cast("string")
                        )
                    ),
                    1,
                    2,
                )
                < _TRAIN_BUCKET
            ).alias("is_train"),
        )
        .filter(F.size("t") >= TRI_N)
    )
    tri = tok.select(
        "doc_id",
        "is_train",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {TRI_N - 1}), "
                f"i -> array_join(slice(t, i, {TRI_N}), ' '))"
            )
        ).alias("g"),
    )
    model = (
        tri.filter(F.col("is_train"))
        .groupBy("g")
        .agg(F.count("*").alias("cnt"))
    )
    scored = tri.join(model, "g", "left").select(
        "doc_id", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tri"),
        F.sum((F.col("cnt") == 0).cast("long")).alias("n_oov"),
        F.sum((F.col("cnt") < TRI_RARE_DF).cast("long")).alias("n_rare"),
        (
            F.sum((F.col("cnt") < TRI_RARE_DF).cast("long")).cast("double")
            / F.count("*")
        ).alias("rare_ratio"),
    )


# True log-space trigram perplexity (the other half of the KenLM
# filter): text_lm_rare_mass keeps the integer-exact OOV/rare proxy;
# this operator computes the actual add-one-smoothed conditional
# log-probabilities a CCNet-style perplexity filter thresholds on.
# Fixed-point discipline: each trigram's -ln P(w|c) is quantized ONCE
# (ROUND to 1e-6, the Gumbel-key / temperature-mix precedent — the ln
# input is a single IEEE division of exact integer counts, identical
# in both engines), then all aggregation is exact int64. A doc's
# average negative log-likelihood is an integer division of exact
# sums — perplexity itself (exp of it) is a monotone transform a
# filter never needs to materialize.
LM_NLL_SCALE = 1_000_000

_LM_PERPLEXITY_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS t,
             SUBSTR(MD5('lm:' || CAST(doc_id AS VARCHAR)), 1, 2)
               < '{_TRAIN_BUCKET}' AS is_train
      FROM documents),
    tri AS (
      SELECT doc_id, is_train,
             ARRAY_TO_STRING(t[i:i+{TRI_N - 2}], ' ') AS c,
             t[i+{TRI_N - 1}] AS w
      FROM tok, LATERAL (SELECT UNNEST(GENERATE_SERIES(
             1, LEN(t) - {TRI_N - 1}, 1)) AS i)
      WHERE LEN(t) >= {TRI_N}),
    model AS (
      SELECT c, w, COUNT(*) AS cnt3 FROM tri WHERE is_train GROUP BY c, w),
    ctx AS (
      SELECT c, CAST(SUM(cnt3) AS BIGINT) AS cnt2 FROM model GROUP BY c),
    voc AS (SELECT COUNT(DISTINCT w) AS v FROM tri WHERE is_train),
    scored AS (
      SELECT tri.doc_id,
             CAST(ROUND(-LN(
               CAST(COALESCE(model.cnt3, 0) + 1 AS DOUBLE)
               / CAST(COALESCE(ctx.cnt2, 0) + voc.v AS DOUBLE))
               * {LM_NLL_SCALE}, 0) AS BIGINT) AS nll_micro
      FROM tri
      LEFT JOIN model ON tri.c = model.c AND tri.w = model.w
      LEFT JOIN ctx ON tri.c = ctx.c
      CROSS JOIN voc)
    SELECT doc_id, COUNT(*) AS n_tri,
           CAST(SUM(nll_micro) AS BIGINT) AS nll_sum_micro,
           CAST(SUM(nll_micro) // COUNT(*) AS BIGINT) AS avg_nll_micro
    FROM scored GROUP BY doc_id
"""


def _nll_micro(cnt3, cnt2, v):
    """Quantized per-trigram NLL: ROUND(-ln((cnt3+1)/(cnt2+v)) · 1e6)
    as int64. The ln input is ONE IEEE division of exact integers —
    identical in both engines — and the quantization happens exactly
    once (the Gumbel-key precedent). Twin: ``CAST(ROUND(-LN(CAST(c3+1
    AS DOUBLE)/CAST(c2+v AS DOUBLE)) * 1e6, 0) AS BIGINT)``.

    Headroom (pinned by ``test_lm_nll_trillion_scale_doc_sum``): the
    value tops out near ln(cnt2+v)·1e6 ≈ 2.8e7 at trillion-token
    context counts, so even a billion-trigram document's sum stays
    ~3e16, far inside int64."""
    p = (
        (F.coalesce(cnt3, F.lit(0)) + 1).cast("double")
        / (F.coalesce(cnt2, F.lit(0)) + v).cast("double")
    )
    return F.round(-F.log(p) * LM_NLL_SCALE).cast("long")


@register(
    "text_lm_perplexity",
    oracle=_LM_PERPLEXITY_ORACLE,
    category="text",
    bench=True,
)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trigram negative log-likelihood under an
    add-one-smoothed conditional model trained on the deterministic
    ~80% split — the actual CCNet/KenLM perplexity-filter computation
    (Wenzek 2020), sharing its train split with ``text_lm_rare_mass``
    so the two scores describe one model family.  P(w | c) =
    (C3(c,w) + 1) / (C2(c) + V): C3 = train trigram count, C2 = train
    count of the 2-token context (Σ_w C3, so probabilities sum to 1),
    V = train third-word vocabulary. An unseen context degrades to
    the uniform 1/V backstop. Emits integer-exact ``nll_sum_micro``
    and ``avg_nll_micro`` (ppl = exp(avg/1e6), monotone — thresholds
    compare the integer directly).

    Scale shape: trigram extraction is a map-side transform; the
    model is a hash groupBy bounded by trigram TYPES (Zipf, not
    corpus size) and shards like any dimension; ctx and voc hang off
    it (voc is a 1-row broadcast). Scoring is two hash joins on
    (c, w) / c and one per-doc aggregate. Fixed-point headroom: a
    trigram's nll_micro tops out near ln(C2+V)·1e6 ≈ 3.4e7 at
    trillion-token scale, so a billion-token document sums to ~3e16,
    2^63-safe (pinned by ``test_fixed_point_headroom``-family).
    Registered in r14 (the judge-approved swap — the slot came from
    ``set_intersect_all``); ``_LM_PERPLEXITY_ORACLE`` is the DuckDB
    oracle, twin-EQUAL at sf0.001 (pytest) and sf0.1 (PROBES_r11+)."""
    d = load_table(spark, sf_dir, "documents")
    # repartition-before-tokenize (the _shingle_sets policy): the
    # trigram construction (an array_join per token position) is the
    # CPU stage and both the model and scoring passes re-derive it
    # from this subtree — projected before the exchange it would run
    # at the scan's (possibly single-file) parallelism
    n = spark.sparkContext.defaultParallelism
    tok = (
        d.select("doc_id", "text")
        .repartition(n, "doc_id")
        .select(
            "doc_id",
            tokens("text").alias("t"),
            (
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("lm:"), F.col("doc_id").cast("string")
                        )
                    ),
                    1,
                    2,
                )
                < _TRAIN_BUCKET
            ).alias("is_train"),
        )
        .filter(F.size("t") >= TRI_N)
    )
    tri = tok.select(
        "doc_id",
        "is_train",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {TRI_N - 1}), i -> "
                f"struct(array_join(slice(t, i, {TRI_N - 1}), ' ') AS c, "
                f"element_at(t, i + {TRI_N - 1}) AS w))"
            )
        ).alias("s"),
    ).select("doc_id", "is_train", "s.c", "s.w")
    # The model table is detached (eager, vocab-bounded — trigram
    # TYPES, not instances) so ctx and voc derive from the pinned
    # blocks instead of re-running the corpus explode per consumer:
    # without the pin the train subtree executes three more times
    # (model join, ctx, voc), the quality-CDF double-compute pattern
    # at 3x. Production materializes the model between runs; the
    # detach is the in-session stand-in (bench clears the pin). V =
    # distinct third words across model keys — identical to distinct
    # w over train trigrams, now read from the small table.
    model = detach(
        tri.filter(F.col("is_train"))
        .groupBy("c", "w")
        .agg(F.count(F.lit(1)).alias("cnt3"))
    )
    ctx = model.groupBy("c").agg(F.sum("cnt3").alias("cnt2"))
    voc = model.agg(F.countDistinct("w").alias("v"))
    scored = (
        tri.join(model, ["c", "w"], "left")
        .join(ctx, "c", "left")
        .crossJoin(F.broadcast(voc))
        .select(
            "doc_id",
            _nll_micro(
                F.col("cnt3"), F.col("cnt2"), F.col("v")
            ).alias("nll_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tri"),
        F.sum("nll_micro").alias("nll_sum_micro"),
        F.expr("sum(nll_micro) div count(1)").alias("avg_nll_micro"),
    )


# Count-min-sketch heavy hitters: the fixed-memory frequency sketch
# (Cormode-Muthukrishnan) behind vocabulary induction and hot-token
# monitoring at corpus scale. D independent hash rows × W buckets of
# counters; an item's estimate is the MIN over its D buckets — always
# ≥ the true count (collisions only inflate), within εN with high
# probability. Hashes are salted md5 prefixes, so the sketch — and
# therefore the estimates — are bit-identical cross-engine.
CMS_D = 4
CMS_W = 256  # 2 hex chars of md5 ⇒ 256 buckets per row
CMS_TOPK = 20


def _cms_bucket(col, d: int):
    """Bucket of ``col`` in sketch row d: first 2 md5 hex chars of the
    salted token. Twin: ``SUBSTR(MD5('cm{d}:' || token), 1, 2)``."""
    return F.substring(F.md5(F.concat(F.lit(f"cm{d}:"), col)), 1, 2)


@register(
    "text_heavy_hitters_cms",
    oracle=f"""
    WITH inst AS (
      SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents),
    sketch AS (
      SELECT d,
             SUBSTR(MD5('cm' || CAST(d AS VARCHAR) || ':' || token), 1, 2)
               AS bucket,
             COUNT(*) AS cnt
      FROM inst, LATERAL (SELECT UNNEST(RANGE(0, {CMS_D})) AS d)
      GROUP BY 1, 2),
    exact AS (SELECT token, COUNT(*) AS exact_n FROM inst GROUP BY token),
    top AS (SELECT * FROM exact
            ORDER BY exact_n DESC, token LIMIT {CMS_TOPK}),
    probes AS (
      SELECT token, exact_n, d,
             SUBSTR(MD5('cm' || CAST(d AS VARCHAR) || ':' || token), 1, 2)
               AS bucket
      FROM top, LATERAL (SELECT UNNEST(RANGE(0, {CMS_D})) AS d))
    SELECT p.token, p.exact_n, CAST(MIN(s.cnt) AS BIGINT) AS cm_est
    FROM probes p JOIN sketch s ON p.d = s.d AND p.bucket = s.bucket
    GROUP BY 1, 2
    """,
    category="text",
)
def text_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters through a count-min sketch, graded against exact
    counts: build a {CMS_D}×{CMS_W} CMS over all token instances, then
    report the top-{CMS_TOPK} tokens (by exact count, deterministic
    tie-break) with both their exact frequency and the sketch's
    estimate — the overcount-only property (cm_est ≥ exact_n, close
    under Zipf) is visible in the graded rows themselves.

    Scale shape: this is the sketch whose point is scale — the
    aggregation state is CMS_D·CMS_W counters ({CMS_D * CMS_W} cells)
    NO MATTER the corpus size, it partial-aggregates map-side, and
    sketches from disjoint corpus shards merge by cell-wise addition
    (same property the portable-HLL rollup exploits). The estimate
    probe joins the 1024-row sketch against the {CMS_TOPK}-row
    candidate list — both broadcast-size by construction."""
    d = load_table(spark, sf_dir, "documents")
    inst = d.select(F.explode(tokens("text")).alias("token"))
    row_structs = lambda: F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("d"),
                    _cms_bucket(F.col("token"), j).alias("bucket"),
                )
                for j in range(CMS_D)
            ]
        )
    ).alias("s")
    sketch = (
        inst.select(row_structs())
        .select("s.d", "s.bucket")
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    exact = inst.groupBy("token").agg(F.count("*").alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), F.asc("token")).limit(CMS_TOPK)
    probes = top.select("token", "exact_n", row_structs()).select(
        "token", "exact_n", "s.d", "s.bucket"
    )
    return (
        sketch.join(F.broadcast(probes), ["d", "bucket"])
        .groupBy("token", "exact_n")
        .agg(F.min("cnt").alias("cm_est"))
    )


# ---------------------------------------------------------------------------
# BM25 top-k lexical retrieval (north-star extension: the classic
# inverted-index scorer the decontamination / quality pipelines use as
# the first stage before embedding re-rank — pairs with
# similarity.sim_topk_cosine, fused in sim_hybrid_rrf_topk)
# ---------------------------------------------------------------------------

BM25_QUERY = ("spark", "join", "window")  # fixed query terms
BM25_K = 10
BM25_SCALE = 1_000_000  # fixed-point scale for the integer tf saturation

# Okapi parameters k1=1.2, b=0.75 expressed as exact integer ratios so
# the per-term score is pure integer arithmetic (bit-identical across
# engines):  tf_sat = (k1+1)*tf / (tf + k1*(1-b) + k1*b*dl/avgdl)
# with avgdl = D/N multiplies through by 10*D into
#   num = 22 * D * tf          (2.2 * tf * 10D)
#   den = 10*D*tf + 3*D + 9*N*dl   (k1(1-b)=0.3, k1*b=0.9)
# and the IDF is the repo's integer rarity weight (N - df), the same
# monotone surrogate text_tfidf_topterms uses instead of ln(N/df).
#
# Overflow headroom: the numerator BM25_SCALE*22*D*tf crosses int64 at
# D*tf ~ 4e11 — reachable on any production corpus (r9 ADVICE #1) — so
# the term evaluates in 128-bit integers: DECIMAL(38,0) in Spark (its
# `div` computes the exact integral quotient of decimals and returns
# BIGINT), HUGEINT in DuckDB. Identical exact quotients, therefore
# bit-identical scores, at every scale the int64 form handled; the new
# safe bound is num < 1e38, i.e. corpus_tokens * tf < ~4.5e30 —
# unreachable (SCALING.md "BM25 fixed-point headroom"). The quotient
# itself is <= 2.2*BM25_SCALE, so the outer (n_docs - df) * quotient
# product stays in int64 up to ~4e11 docs; SUM over |Q|=3 terms is
# CAST AS BIGINT in both engines.
_BM25_TERM_SQL = (
    f"(n_docs - df) * ((CAST({BM25_SCALE} AS HUGEINT) * 22 * d_tokens * tf)"
    f" // (10 * CAST(d_tokens AS HUGEINT) * tf + 3 * d_tokens"
    f" + 9 * CAST(n_docs AS HUGEINT) * dl))"
)
_BM25_TERM_SPARK = (
    f"(n_docs - df) * ((CAST({BM25_SCALE} AS DECIMAL(38,0)) * 22"
    f" * d_tokens * tf)"
    f" div (CAST(10 AS DECIMAL(38,0)) * d_tokens * tf"
    f" + CAST(3 AS DECIMAL(38,0)) * d_tokens"
    f" + CAST(9 AS DECIMAL(38,0)) * n_docs * dl))"
)


# The scored-relation CTE chain, shared with the RRF hybrid oracle in
# operators/similarity.py (compose as  WITH {_BM25_SCORED_CTES}, ...).
_BM25_SCORED_CTES = f"""toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term
      FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM toks WHERE term <> '' GROUP BY doc_id, term),
    dl AS (
      SELECT doc_id, COUNT(*) AS dl
      FROM toks WHERE term <> '' GROUP BY doc_id),
    stats AS (
      SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS d_tokens
      FROM dl),
    q AS (SELECT UNNEST({list(BM25_QUERY)}) AS term),
    docfreq AS (
      SELECT term, COUNT(*) AS df FROM tf
      WHERE term IN (SELECT term FROM q) GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(SUM({_BM25_TERM_SQL}) AS BIGINT) AS bm25,
             COUNT(*) AS n_terms
      FROM tf
      JOIN q USING (term)
      JOIN docfreq USING (term)
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id)"""


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH {_BM25_SCORED_CTES}
    SELECT doc_id, bm25, n_terms FROM scored
    ORDER BY bm25 DESC, doc_id LIMIT {BM25_K}
    """,
    category="text",
    bench=True,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval for a fixed term query — the inverted-index
    scorer (tf, df, doc-length normalization) in exact integer fixed
    point: Okapi k1=1.2 / b=0.75 become the integer ratios 22/10, 3/10
    and 9/10 multiplied through by 10*D (see _BM25_TERM_SQL), the tf
    saturation is one 128-bit integral division (DECIMAL(38,0) div /
    HUGEINT — int64 would overflow at ~4e11 corpus tokens), and the
    IDF is the integer rarity weight (N - df) — so the score is
    bit-identical across engines, no float in sight.

    Scale shape: tf/df/dl are map-side-combinable integer aggregates
    over the token explode (the postings build — computed once, reused
    by any query against the corpus); query terms and the
    query-filtered docfreq slice broadcast (|Q| rows); the per-doc
    score is one partial-agg groupBy on doc_id over ONLY the postings
    matching a query term; top-k is TakeOrderedAndProject — k rows per
    partition, never a global sort. At 100 TB the postings relation is
    the materialized index and a query touches |Q| posting lists, not
    the corpus."""
    return bm25_scored(spark, sf_dir).orderBy(
        F.desc("bm25"), F.asc("doc_id")
    ).limit(BM25_K)


def bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25-scored relation (doc_id, bm25, n_terms) for BM25_QUERY
    before top-k — shared by ``text_bm25_topk`` and the RRF hybrid
    fusion in operators/similarity.py."""
    d = load_table(spark, sf_dir, "documents")
    # ONE tf definition (r19): dl derives from the postings — dl =
    # SUM(tf) per doc, bit-identical to counting token instances
    # directly. r20 drops the r19 localCheckpoint pin on tf: the
    # eager checkpoint WRITE of ~1M posting rows (strings) landed on
    # every timed pass and measured 0.2-0.5s slower than leaving tf
    # unpinned (fresh-JVM interleaved floors 1.49-1.52 unpinned vs
    # 1.66-2.77 pinned; in-session alternation min 1.60 vs 2.15; a
    # .persist() pin measured worst of the three at 2.24-2.88).
    # Unpinned, the consumers' identical (doc_id,term) exchange
    # subtrees dedup in pairs at runtime (AQE stage reuse — the
    # scored/dl pair and the docfreq/stats pair differ only by a
    # join-inferred isnotnull(doc_id)), so the corpus tokenizes twice,
    # as the pre-r19 form did, but nothing is checkpointed. At 100 TB
    # the postings are a standing MATERIALIZED index (the docstring's
    # deployment shape) and a query touches |Q| posting lists either
    # way; the pin only ever amortized the bench's per-run index
    # build, and the measurement says it does not pay for itself.
    # A repartition before the explode was separately REVERTED in r19
    # on a full-query A/B: the split+explode map stage is too cheap
    # to amortize shuffling the text payload.
    toks = (
        d.select("doc_id", "text")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("d_tokens")
    )
    qterms = spark.createDataFrame(
        [(t,) for t in BM25_QUERY], "term string"
    )
    docfreq = (
        tf.join(F.broadcast(qterms), "term")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(docfreq), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr(_BM25_TERM_SPARK)).alias("bm25"),
            F.count("*").alias("n_terms"),
        )
    )
    return scored


# ---------------------------------------------------------------------------
# Per-language quality normalization via an exact quantized-score CDF —
# absolute quality heuristics are not comparable across languages (a
# stopword-ratio term is English-tuned; every language has its own
# score distribution), so curation thresholds must be percentile-based
# PER LANGUAGE. The scale problem: exact per-doc percent_rank windows
# one task per language over the whole stratum. The fix here: quantize
# the score once (it is already cross-engine bit-identical), build the
# exact per-language CDF over DISTINCT QUANTIZED VALUES (bounded by the
# quantization width — ~1e6 rows per language at any corpus size), and
# broadcast-join each doc its own value's cumulative count. Exact
# percentiles, no per-doc window anywhere.
# ---------------------------------------------------------------------------

QCDF_SCALE = 1_000_000  # quality quantized to 1e-6 (score is in [0,1])

_QUALITY_CDF_ORACLE = f"""
    WITH m AS (
      SELECT doc_id, lang,
             LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
             LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_distinct,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                 t -> LIST_CONTAINS(['the','a','of','and','is','to','in'],
                                    t))) AS stop_hits
      FROM documents),
    q AS (
      SELECT doc_id, lang,
             CAST(ROUND({QCDF_SCALE} * (
               0.5 * (n_distinct / CAST(n_tokens AS DOUBLE))
             + 0.2 * (stop_hits / CAST(n_tokens AS DOUBLE))
             + 0.3 * LEAST(n_tokens / 256.0, 1.0))) AS BIGINT) AS q_milli
      FROM m),
    hist AS (
      SELECT lang, q_milli, COUNT(*) AS c FROM q GROUP BY lang, q_milli),
    cdf AS (
      SELECT lang, q_milli, c,
             COALESCE(SUM(c) OVER (PARTITION BY lang ORDER BY q_milli
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below,
             SUM(c) OVER (PARTITION BY lang) AS n_lang
      FROM hist)
    SELECT q.doc_id, q.lang, q.q_milli,
           CAST((cdf.below * {QCDF_SCALE})
                // GREATEST(cdf.n_lang - 1, 1) AS BIGINT) AS pct_milli,
           CAST(LEAST((cdf.below * 10) // GREATEST(cdf.n_lang, 1), 9)
                AS BIGINT) AS decile
    FROM q JOIN cdf ON q.lang = cdf.lang AND q.q_milli = cdf.q_milli
"""


def text_quality_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact percentile normalization of the quality
    score: each doc's ``pct_milli`` is (docs of its language with
    strictly lower quantized score) / (n_lang - 1) in 1e-6 fixed point
    — the percent_rank a per-doc window would give, with ties sharing
    a percentile, computed WITHOUT any per-doc window:

    1. quantize the (already bit-identical) quality double once to
       QCDF_SCALE — ROUND is the repo's cross-engine precedent;
    2. exact histogram: groupBy(lang, q_milli).count — map-side
       combinable, output bounded by languages × quantization width
       (≤ ~1e6 rows per language NO MATTER the corpus size);
    3. cumulative window over the HISTOGRAM (per-language, ordered by
       value) — a window whose input is the bounded histogram, never
       the corpus;
    4. join each doc its value's below-count — the histogram side is
       small by construction, but carries NO broadcast hint (its
       bound, languages × quantization width, can reach millions of
       rows; AQE dispatches on the measured size, the repo's
       no-unconditional-broadcast policy).

    This is how exact distribution normalization survives 100 TB: the
    corpus-sized work is ONE narrow tokenize+score map (the quantized
    projection is persisted before fanning into its two consumers —
    histogram and final join — so the tokenize never runs twice; the
    pin is released once the result is materialized, r11 ADVICE) and
    one partial-agg groupBy; contrast ``pipeline_stratified_sample``'s
    per-stratum
    row_number, which is exact but funnels each stratum through one
    window task (fine for sampling ranks, wrong for corpus-wide score
    normalization). Integer outputs end-to-end (pct and decile are
    integer div of exact counts). Unregistered (r11's slot is spent;
    queue: incremental winnow, temperature mix, source overlap, global
    shuffle, then this); ``_QUALITY_CDF_ORACLE`` is the tested DuckDB
    twin."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = token_count("text")
    n_distinct = F.size(F.array_distinct(tokens("text")))
    stop = stopword_hits("text", "en")
    # r19 note: a repartition-before-metrics (the _shingle_sets
    # policy) was committed, then REVERTED on a full-query interleaved
    # A/B: fresh-JVM floors 1.92/2.15s with it vs 0.99/1.17s without
    # at matched pass canaries — the triple-split projection is too
    # cheap to amortize shuffling the full text payload (the same
    # economics as the multimodal decode revert; contrast the winnow
    # md5-per-position stages, where the identical repartition
    # measured 0.5-0.7x). A subplan-only A/B had read "neutral"; the
    # full query is the unit that decides.
    m = (
        d.select("doc_id", "lang", "text")
        .select(
            "doc_id",
            "lang",
            n_tok.alias("n_tokens"),
            n_distinct.alias("n_distinct"),
            stop.alias("stop_hits"),
        )
    )
    ttr = F.col("n_distinct") / F.col("n_tokens").cast("double")
    swr = F.col("stop_hits") / F.col("n_tokens").cast("double")
    length_score = F.least(F.col("n_tokens") / 256.0, F.lit(1.0))
    q = m.select(
        "doc_id",
        "lang",
        F.round(
            F.lit(QCDF_SCALE)
            * (0.5 * ttr + 0.2 * swr + 0.3 * length_score)
        )
        .cast("long")
        .alias("q_milli"),
    ).persist()
    hist = q.groupBy("lang", "q_milli").agg(F.count(F.lit(1)).alias("c"))
    wv = (
        Window.partitionBy("lang")
        .orderBy(F.asc("q_milli"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cdf = hist.select(
        "lang",
        "q_milli",
        F.coalesce(F.sum("c").over(wv), F.lit(0)).alias("below"),
        F.sum("c").over(Window.partitionBy("lang")).alias("n_lang"),
    )
    pct = F.expr(f"(below * {QCDF_SCALE}) div greatest(n_lang - 1, 1)")
    decile = F.expr("least((below * 10) div greatest(n_lang, 1), 9)")
    # no broadcast hint: the CDF is corpus-size-INDEPENDENT but its
    # bound (languages x quantization width) can reach millions of
    # rows — AQE dispatches on the measured size, the same policy the
    # two-tier flagged-set join follows (r9 fix precedent)
    try:
        return detach(
            q.join(cdf, ["lang", "q_milli"]).select(
                "doc_id",
                "lang",
                "q_milli",
                pct.alias("pct_milli"),
                decile.alias("decile"),
            )
        )
    finally:
        q.unpersist()
