"""Corpus composition: mixture accounting, cross-source overlap,
per-source quality — the tables a mixture-building pass reads first.

The first table every mixture-building pass needs: what does the
corpus actually contain, in the unit the trainer budgets by (tokens),
not the unit crawls report (documents)? Feeds stratified_sample /
stratified_resample rate choices and makes their effect auditable —
sample_report shows per-stratum keeps, this shows the baseline mix.

Shares are ratios of exact integer sums (whitespace token counts,
functions/text.token_count), ONE float division each, rounded 6dp.

Scale shape: one hash aggregate with map-side combine collapses the
corpus to |lang|x|source| rows; the share windows run over that tiny
aggregate only (the role_mix_daily idiom) — the data is never
re-scanned or re-shuffled for totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h60
from ..functions.text import EN_STOPWORDS, shingles, token_count, ws_tokens


def corpus_mix(
    docs: DataFrame,
    lang_col: str = "lang",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-(lang, source) mixture report.

    Returns (lang, source, n_docs, n_tokens, doc_share, token_share);
    shares sum to 1 across the corpus.
    """
    agg = docs.groupBy(lang_col, source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("n_tokens"),
    )
    w = Window.partitionBy()
    return agg.select(
        lang_col,
        source_col,
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6
        ).alias("doc_share"),
        F.round(
            F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w), 6
        ).alias("token_share"),
    )


def source_overlap(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Cross-source content-overlap matrix over k-word shingles.

    For every unordered source pair (src_a < src_b): distinct shingle
    digests present in BOTH sources, each side's own distinct-shingle
    count, and the overlap as a share of the smaller side
    (containment). The table that says "source B is 40% a re-crawl of
    source A" before a mixture weight double-counts them — shingle
    (not whole-doc) granularity so partial copies and boilerplate
    count too.

    Scale shape: only (source, 60-bit digest) rows ever shuffle, and
    only ONCE — one map-side-combining collect_set to per-digest
    source sets (set size is bounded by |sources|, a small fixed
    dimension, so the agg state is tiny). Pairs come from a double
    posexplode of each sorted set — no self-join, at most
    C(|sources|, 2) rows per digest — and both the per-source totals
    and the pair counts are aggregates over that one exchange's
    output; full text never leaves the scan. The |sources|-row totals
    broadcast back onto the pair rows.
    """
    sets = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(shingles(text_col, k)).alias("sh"),
        )
        .select("source", h60("sh").alias("sh_h"))
        .groupBy("sh_h")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
    )
    per = sets.select(F.explode("srcs").alias("source")).groupBy(
        "source"
    ).agg(F.count(F.lit(1)).alias("n_texts"))
    pairs = (
        sets.filter(F.size("srcs") >= 2)
        .select("srcs", F.posexplode("srcs").alias("i", "src_a"))
        .select("src_a", "i", F.posexplode("srcs").alias("j", "src_b"))
        .filter(F.col("i") < F.col("j"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    pa = F.broadcast(per.select(F.col("source").alias("src_a"), F.col("n_texts").alias("n_a")))
    pb = F.broadcast(per.select(F.col("source").alias("src_b"), F.col("n_texts").alias("n_b")))
    return (
        pairs.join(pa, "src_a")
        .join(pb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared").cast("double") / F.least("n_a", "n_b"),
                6,
            ).alias("overlap_share"),
        )
    )


SHORT_DOC_TOKENS = 10


def source_quality(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    short_tokens: int = SHORT_DOC_TOKENS,
) -> DataFrame:
    """Per-source macro quality dashboard — the filter-threshold table
    a curation pass reads next to corpus_mix before setting per-source
    keep rates.

    Returns (source, n_docs, sum_tokens, tokens_per_doc, punct_share,
    stopword_share, short_doc_share). Every share is a ratio of exact
    integer sums (MACRO ratios — sum-of-counts over sum-of-counts, not
    a mean of per-doc ratios, so long docs weigh more, deliberately);
    ONE float division each, rounded 6dp. Zero denominators yield NULL
    (both engines' division semantics).

    Scale shape: one hash aggregate with map-side combine collapses
    the corpus to |sources| rows; per-doc counting expressions are all
    whole-stage-codegen built-ins, zero Python.
    """
    toks = ws_tokens(text_col)
    n_sw = F.size(
        F.filter(toks, lambda x: F.lower(x).isin(EN_STOPWORDS))
    ).cast("long")
    n_punct = F.regexp_count(
        F.col(text_col), F.lit("[^A-Za-z0-9\\s]")
    ).cast("long")
    agg = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("sum_tokens"),
        F.sum(n_punct).alias("sum_punct"),
        F.sum(F.length(text_col).cast("long")).alias("sum_chars"),
        F.sum(n_sw).alias("sum_stopwords"),
        F.sum(
            (token_count(text_col) < short_tokens).cast("long")
        ).alias("n_short"),
    )
    share = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0,
        F.round(F.col(num).cast("double") / F.col(den).cast("double"), 6),
    )
    return agg.select(
        "source",
        "n_docs",
        "sum_tokens",
        share("sum_tokens", "n_docs").alias("tokens_per_doc"),
        share("sum_punct", "sum_chars").alias("punct_share"),
        share("sum_stopwords", "sum_tokens").alias("stopword_share"),
        share("n_short", "n_docs").alias("short_doc_share"),
    )
