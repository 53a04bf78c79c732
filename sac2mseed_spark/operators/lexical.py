"""Per-conversation lexical diversity (type-token ratio).

The curation-side text signal over TRANSCRIPTS (text_quality covers
the documents corpus): how repetitive is a conversation's language?
Grind loops — the same error message or tool invocation cycling for
hundreds of turns — show a collapsing type-token ratio, and a
mixture-building pass wants them down-weighted.

TTR = distinct terms / total terms over the whitespace tokenization
shared with the rest of the text family (functions/text.ws_tokens and
its DuckDB twin). A ratio of two exact integers, one float division,
rounded 6dp.

Scale shape: explode once to (conv, term); total counts come from a
hash aggregate on the conv prefix, distinct counts from a (conv,
term) distinct that reuses the same shuffle partitioning; text itself
never shuffles — only tokens and counts do. (count(DISTINCT term)
inside one aggregate would expand-shuffle every token twice; the
explicit distinct-then-count is one pass each.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import ws_tokens


def lexical_diversity(
    transcripts: DataFrame, min_tokens: int = 20
) -> DataFrame:
    """Per-conversation type-token ratio.

    Returns (conv_id, n_tokens, n_types, ttr) for conversations with
    >= min_tokens tokens.
    """
    if min_tokens < 1:
        raise ValueError(f"min_tokens must be >= 1, got {min_tokens}")

    terms = transcripts.select(
        "conv_id", F.explode(ws_tokens("text")).alias("term")
    )
    totals = terms.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    types = (
        terms.distinct()
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_types"))
    )
    ttr = F.col("n_types").cast("double") / F.col("n_tokens").cast(
        "double"
    )
    return (
        totals.join(types, "conv_id")
        .filter(F.col("n_tokens") >= min_tokens)
        .select(
            "conv_id",
            "n_tokens",
            "n_types",
            F.round(ttr, 6).alias("ttr"),
        )
    )
