"""Shared text-analysis column expressions (all JVM-side built-ins).

Everything here is a pure ``pyspark.sql.functions`` composition — no
Python UDFs — so the hot path stays inside whole-stage codegen at any
scale. Each expression documents its DuckDB twin for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/heuristic language id.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "is", "to", "in"],
    "es": ["el", "la", "de", "que", "y", "los", "en"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu"],
    "fr": ["le", "la", "de", "et", "est", "les", "une"],
    "zh": ["的", "是", "了", "在", "和", "有", "我"],
}


def normalize(col: Column | str) -> Column:
    """lower + trim + collapse runs of whitespace.

    Twin: ``REGEXP_REPLACE(TRIM(LOWER(c)), ' +', ' ', 'g')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), " +", " ")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization. Twin: ``STRING_SPLIT(c, ' ')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    """Twin: ``LEN(STRING_SPLIT(c, ' '))``."""
    return F.size(tokens(col))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Count of tokens in the language's stopword list.

    Twin: ``LEN(LIST_FILTER(STRING_SPLIT(c,' '), t -> t IN (...)))``.
    """
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda t: t.isin(*words)))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    Twin: ``MD5(REGEXP_REPLACE(TRIM(LOWER(c)), ' +', ' ', 'g'))`` —
    md5 is bit-identical across engines, unlike murmur/xxhash.
    """
    return F.md5(normalize(col))


def shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-token shingles (the classic near-dup unit).

    Twin (k=3): ``LIST_DISTINCT([t[i]||' '||t[i+1]||' '||t[i+2]
    for i in generate_series(1, LEN(t)-2)])`` over ``t = STRING_SPLIT``.

    Documents with fewer than ``k`` tokens yield an EMPTY array —
    matching DuckDB's ``generate_series(1, LEN(t)-2)``, which is empty
    when the upper bound is < 1. Without the guard ``F.sequence(0,
    size-k)`` would *descend* into negative indices and element_at
    would throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT.
    """
    t = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(t) - k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, i + j + 1) for j in range(k)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(t) >= k, grams).otherwise(
            F.array().cast("array<string>")
        )
    )
