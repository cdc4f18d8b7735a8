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


def shingles_from_tokens(tok: Column | str, k: int = 3) -> Column:
    """Distinct k-token shingles from an ALREADY-MATERIALIZED token
    array column (the classic near-dup unit).

    Hot paths must pre-split: expressions referenced inside a
    higher-order-function lambda are re-evaluated PER ELEMENT (lambda
    bodies block common-subexpression elimination), so an inline
    ``split(text)`` here would re-split the whole document once per
    shingle — O(tokens²) per row, measured 8× slower at sf0.1. Project
    the token array in its own select first; Catalyst keeps the
    multi-referenced alias un-inlined, so the split runs once per row.

    Twin (k=3): ``LIST_DISTINCT([t[i]||' '||t[i+1]||' '||t[i+2]
    for i in generate_series(1, LEN(t)-2)])`` over ``t = STRING_SPLIT``.

    Documents with fewer than ``k`` tokens yield an EMPTY array —
    matching DuckDB's ``generate_series(1, LEN(t)-2)``, which is empty
    when the upper bound is < 1. Without the guard the sequence would
    *descend* into negative indices and throw.
    """
    t = F.col(tok) if isinstance(tok, str) else tok
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - k + 1),
        lambda i: F.concat_ws(" ", F.slice(t, i, k)),
    )
    return F.array_distinct(
        F.when(F.size(t) >= k, grams).otherwise(
            F.array().cast("array<string>")
        )
    )


def shingles(col: Column | str, k: int = 3) -> Column:
    """One-shot convenience over raw text — fine for bounded slices.
    On the dedup hot path use ``shingles_from_tokens`` over a
    pre-projected token array (see its docstring for why)."""
    return shingles_from_tokens(tokens(col), k)
