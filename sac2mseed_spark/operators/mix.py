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

from ..functions.text import token_count


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
