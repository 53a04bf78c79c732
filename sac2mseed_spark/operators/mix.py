"""Corpus mixture accounting: docs and tokens by (lang, source).

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
from ..functions.text import shingles, token_count


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
