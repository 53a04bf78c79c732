"""Text analysis for training-data pipelines: tokenization, quality
scoring, language-ID heuristic, shingling, document fingerprinting.

All whole-stage-codegen expressions (no Python UDFs) so a 100 TB documents
scan stays JVM-side; every definition is chosen to be expressible verbatim
in ANSI SQL for the DuckDB oracle (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import h60

# Tiny English stopword list shared with the oracle SQL (must stay sorted
# and literal-identical on both sides).
EN_STOPWORDS = ["a", "and", "for", "in", "is", "it", "of", "on", "the", "to", "was"]

# BPE-ish subword proxy: runs of letters, runs of digits, or single
# non-alphanumeric non-space characters.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def ws_tokens(text: Column | str) -> Column:
    """Whitespace tokens of trimmed text; empty text -> empty array."""
    t = F.trim(F.col(text) if isinstance(text, str) else text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    return F.size(ws_tokens(text)).cast("long")


def bpe_token_count(text: Column | str) -> Column:
    """Count of BPE-ish subword tokens (regexp occurrences)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE)).cast("long")


def stopword_ratio(text: Column | str) -> Column:
    toks = ws_tokens(text)
    sw = F.size(
        F.filter(toks, lambda x: F.lower(x).isin(EN_STOPWORDS))
    )
    return F.when(F.size(toks) > 0, sw / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.regexp_count(c, F.lit("[^A-Za-z0-9\\s]"))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Composite quality in [0,1]: length factor x (1 - punct) x
    (stopword presence factor). Same closed form in the oracle SQL."""
    c = F.col(text) if isinstance(text, str) else text
    len_factor = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    return F.round(
        len_factor * (1.0 - punct_ratio(c)) * (0.5 + 0.5 * stopword_ratio(c)), 6
    )


def lang_id(text: Column | str, threshold: float = 0.05) -> Column:
    """n-gram-free language heuristic: English iff stopword ratio exceeds
    the threshold; short texts are 'und'. A real model slots in behind the
    same column contract."""
    toks = ws_tokens(text)
    return (
        F.when(F.size(toks) < 3, F.lit("und"))
        .when(stopword_ratio(text) >= threshold, F.lit("en"))
        .otherwise(F.lit("xx"))
    )


def shingles(text: Column | str, k: int = 3) -> Column:
    """k-word shingles as strings; texts with < k tokens yield the whole
    trimmed text as a single shingle (so short docs still participate)."""
    toks = ws_tokens(text)
    n = F.size(toks)
    full = F.array_join(toks, " ")
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.when(n >= k, grams).otherwise(F.array(full))


def doc_fingerprint(text: Column | str, k: int = 8) -> Column:
    """Winnowing-style fingerprint: min 60-bit hash over k-gram character
    shingles of the trimmed text (rolling-hash analogue, computed set-wise —
    min() is order-free so it distributes)."""
    t = F.trim(F.col(text) if isinstance(text, str) else text)
    n = F.length(t)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: t.substr(i, F.lit(k)),
    )
    hashed = F.transform(grams, lambda g: h60(g))
    return F.array_min(hashed)
