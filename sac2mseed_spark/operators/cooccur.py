"""Item co-occurrence within a grouping key (set-Jaccard association).

Which items travel together? For every unordered pair of items that
appear under the same key (tools within a conversation, salient terms
within a document): how many keys contain both, how many contain
each, and the Jaccard of their key sets ``n_ab / (n_a + n_b − n_ab)``.
Jaccard rather than lift/PMI keeps the statistic a pure RATIO OF
INTEGERS — no corpus-total scalar to broadcast and no log(), so it
replays bit-for-bit in the oracle (the same log-free discipline as
salient_terms / tool_gini).

Scale shape: the input reduces to distinct (key, item) first — after
that nothing is proportional to raw rows. Pair generation is a
SELF-JOIN CO-PARTITIONED ON the key with ``item_a < item_b``, so its
fan-out per key is k·(k−1)/2 where k = items under that key — callers
bound k structurally (tool vocabulary; top-K terms per document), so
the blow-up all-pairs shape can never appear. The pair and per-item
aggregates are vocabulary-sized, and the final enrichment joins
broadcast the per-item counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import EN_STOPWORDS, ws_tokens


def item_cooccurrence(
    keyed_items: DataFrame,
    key_col: str = "key",
    item_col: str = "item",
    min_pair_keys: int = 1,
) -> DataFrame:
    """Unordered item pairs with key-set Jaccard over a (key, item)
    relation (deduplicated internally).

    Returns (item_a, item_b, n_ab, n_a, n_b, jaccard) for pairs seen
    under >= min_pair_keys keys; jaccard rounded 6dp.
    """
    if min_pair_keys < 1:
        raise ValueError(
            f"min_pair_keys must be >= 1, got {min_pair_keys}"
        )
    used = (
        keyed_items.select(
            F.col(key_col).alias("__k"), F.col(item_col).alias("__i")
        )
        .distinct()
    )
    a, b = used.alias("a"), used.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.__k") == F.col("b.__k"))
            & (F.col("a.__i") < F.col("b.__i")),
        )
        .groupBy(
            F.col("a.__i").alias("item_a"),
            F.col("b.__i").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    per_item = used.groupBy("__i").agg(F.count(F.lit(1)).alias("n_t"))
    ta = per_item.select(
        F.col("__i").alias("item_a"), F.col("n_t").alias("n_a")
    )
    tb = per_item.select(
        F.col("__i").alias("item_b"), F.col("n_t").alias("n_b")
    )
    jac = F.col("n_ab").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_ab")
    ).cast("double")
    return (
        pairs.filter(F.col("n_ab") >= min_pair_keys)
        .join(F.broadcast(ta), "item_a")
        .join(F.broadcast(tb), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(jac, 6).alias("jaccard"),
        )
    )


def tool_cooccurrence(
    transcripts: DataFrame, min_pair_convs: int = 1
) -> DataFrame:
    """Tool pairs co-used within conversations. Turns with NULL/blank
    tool are ignored (a no-tool turn cannot co-occur)."""
    used = transcripts.filter(
        F.col("tool").isNotNull() & (F.trim(F.col("tool")) != "")
    ).select("conv_id", "tool")
    out = item_cooccurrence(used, "conv_id", "tool", min_pair_convs)
    return out.select(
        F.col("item_a").alias("tool_a"),
        F.col("item_b").alias("tool_b"),
        "n_ab",
        "n_a",
        "n_b",
        "jaccard",
    )


def term_cooccurrence(
    docs: DataFrame,
    k: int = 4,
    min_pair_docs: int = 1,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Co-occurrence of each document's top-k terms (by tf, ties to
    the lexically smaller term — deterministic), stopwords dropped.

    The top-k cut bounds the per-document pair fan-out at k(k−1)/2
    regardless of document length, which is what makes the self-join
    safe at corpus scale.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    tf = (
        docs.select(
            F.col(doc_col).alias("doc"),
            F.explode(ws_tokens(text_col)).alias("term"),
        )
        .filter(~F.lower("term").isin(EN_STOPWORDS))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    top = Window.partitionBy("doc").orderBy(
        F.col("tf").desc(), F.col("term").asc()
    )
    sets = (
        tf.withColumn("__rk", F.row_number().over(top))
        .filter(F.col("__rk") <= k)
        .select("doc", "term")
    )
    out = item_cooccurrence(sets, "doc", "term", min_pair_docs)
    return out.select(
        F.col("item_a").alias("term_a"),
        F.col("item_b").alias("term_b"),
        "n_ab",
        "n_a",
        "n_b",
        "jaccard",
    )
