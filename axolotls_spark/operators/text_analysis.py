"""Text analysis operators — language ID, quality scoring, token
counting, document fingerprinting.

All pure Column expressions (JVM-side, codegen) — per-document work
is linear in text length, no shuffles except where an aggregate is
requested. This is the cheap first pass of an LLM data pipeline that
runs before dedup/filtering at 100 TB, so staying out of Python is
the difference between a scan-rate and a UDF-rate job.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from axolotls_spark.operators.dedup import token_hash, tokens_col

# Tiny per-language stopword inventories for the n-gram/stopword
# heuristic. Real pipelines would load fastText lid.176; the operator
# shape (per-language hit ratio → argmax) is identical.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "value", "table"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pas"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "no"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count (the BPE-ish regex variant is
    ``regexp_count(text, token_re)`` — same plan shape)."""
    return F.size(tokens_col(text)).cast("long")


# BPE-ish pre-tokenizer: letter runs, digit runs, single
# non-alphanumeric marks — the GPT-2 pre-tokenizer's shape without
# the contraction special cases, kept to syntax RE2 (DuckDB) and
# Java regex (Spark) evaluate identically.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens_col(text: Column) -> Column:
    """Array of BPE-ish pre-tokens (JVM-side regexp_extract_all —
    no Python in the loop, stays in codegen)."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens_col(text)
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS[lang]))
    )
    return hits / F.nullif(F.size(toks), F.lit(0))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio; argmax = predicted language."""
    return {lang: stopword_ratio(text, lang) for lang in STOPWORDS}


def quality_features(text: Column) -> dict[str, Column]:
    """Heuristic quality signals (Gopher/C4-style cheap filters):
    length, token stats, punctuation/digit/space ratios, mean token
    length, repetition (distinct-token ratio)."""
    toks = tokens_col(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_token_len": (
            F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t))
            / F.nullif(n_tokens, F.lit(0))
        ),
        "distinct_token_ratio": (
            F.size(F.array_distinct(toks)) / F.nullif(n_tokens, F.lit(0))
        ),
        "space_ratio": (
            (n_chars - F.length(F.replace(text, F.lit(" "), F.lit(""))))
            / F.nullif(n_chars, F.lit(0))
        ),
        "digit_ratio": (
            F.length(F.regexp_replace(text, r"[^0-9]", ""))
            / F.nullif(n_chars, F.lit(0))
        ),
    }


def doc_fingerprint(text: Column) -> Column:
    """Order-sensitive rolling document fingerprint.

    Polynomial rolling hash over token hashes mod 2^31-1
    (acc = acc*31 + h(tok)); unlike a set-based signature this
    distinguishes permuted documents. Engine-independent (md5-based
    token hash), so the oracle reproduces it exactly.
    """
    p = 2_147_483_647
    return F.aggregate(
        tokens_col(text),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + (token_hash(t) % p)) % p,
    )
