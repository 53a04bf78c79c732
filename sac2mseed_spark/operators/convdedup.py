"""Conversation-level exact dedup (ordered transcript digest).

Whole-conversation duplicates — replayed sessions, retried batch
imports, mirrored shards — are the transcript analogue of
dedup_exact's duplicated documents. Two conversations are duplicates
iff their turn texts are identical IN ORDER (the per-row invariant's
stable (conv_id, turn_idx, ts) ordering, BASELINE.json input_hint).

The shuffle stays narrow the same way dedup_exact's does: each turn's
text is hashed to a 60-bit digest FIRST (map-side, before any
exchange), so the conv-partitioned combine moves 8 bytes per turn,
never text. The conversation digest is then the digest of the
ORDER-DEFINED concatenation of per-turn digests — sort_array over
(turn_idx, hash) structs on the Spark side, string_agg(... ORDER BY
turn_idx) in the oracle, the parity idiom proven by the SAX operator.

Collision posture matches dedup_exact: 60-bit per-turn and per-conv
digests, odds ~n²/2⁶¹, accepted unverified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60


def conv_dedup(transcripts: DataFrame) -> DataFrame:
    """One row per distinct ordered transcript: keeper = min conv_id,
    plus group size.

    Returns (keep_conv, n_dups, conv_h60).
    """
    per_turn = transcripts.select(
        "conv_id",
        F.struct(
            F.col("turn_idx").alias("i"), h60("text").alias("h")
        ).alias("__p"),
    )
    canon = F.concat_ws(
        ",",
        F.transform(
            F.sort_array(F.collect_list("__p")),
            lambda p: p["h"].cast("string"),
        ),
    )
    return (
        per_turn.groupBy("conv_id")
        .agg(h60(canon).alias("conv_h60"))
        .groupBy("conv_h60")
        .agg(
            F.min("conv_id").alias("keep_conv"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("keep_conv", "n_dups", "conv_h60")
    )


# Boilerplate turns ("ok", "continue", canned tool acks) appear in huge
# numbers of conversations; capping a turn digest's conversation
# frequency bounds the inverted-index self-join exactly as
# dedup.NGRAM_DF_CAP does for document shingles. A turn shared by more
# conversations than this carries no pair-discrimination signal anyway.
CONV_TURN_DF_CAP = 256


def conv_near_dup(
    transcripts: DataFrame,
    threshold: float = 0.9,
    df_cap: int | None = CONV_TURN_DF_CAP,
) -> DataFrame:
    """Near-duplicate conversation pairs: Jaccard over distinct
    turn-text digest SETS (order-free — the complement of conv_dedup's
    order-exact digest; catches replays with dropped/reordered turns).

    Returns (a, b, inter, jaccard) for pairs a < b with jaccard >=
    threshold over the df-capped turn universe.

    Scale shape is ngram_jaccard_pairs' at conversation granularity:
    turn texts hash to 8-byte digests map-side, the df cap semi-join
    lands on the same turn_h partitioning the candidate self-join
    needs, |inter| and set sizes are exact integers, and the final
    jaccard is ONE float division rounded 6dp.
    """
    ts = transcripts.select(
        "conv_id", h60("text").alias("turn_h")
    ).distinct()
    if df_cap is not None:
        keep = (
            ts.groupBy("turn_h")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= df_cap)
            .select("turn_h")
        )
        ts = ts.join(keep, "turn_h", "left_semi")
    sizes = ts.groupBy("conv_id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = (
        ts.alias("l")
        .join(ts.alias("r"), "turn_h")
        .filter(F.col("l.conv_id") < F.col("r.conv_id"))
        .groupBy(
            F.col("l.conv_id").alias("a"), F.col("r.conv_id").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sza = F.broadcast(
        sizes.select(F.col("conv_id").alias("a"), F.col("sz").alias("sza"))
    )
    szb = F.broadcast(
        sizes.select(F.col("conv_id").alias("b"), F.col("sz").alias("szb"))
    )
    return (
        pairs.join(sza, "a")
        .join(szb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sza") + F.col("szb") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "jaccard")
    )


def conv_dup_clusters(
    transcripts: DataFrame,
    threshold: float = 0.9,
    df_cap: int | None = CONV_TURN_DF_CAP,
    max_iters: int = 25,
) -> DataFrame:
    """Conversation duplicate families: connected components over the
    conv_near_dup pair graph (dedup.components_from_pairs min-label
    propagation — see its scale notes). Returns (conv_id, cluster_id,
    cluster_size) for conversations in a family of size >= 2;
    cluster_id = lexicographically smallest member, the keeper."""
    from .dedup import components_from_pairs

    pairs = conv_near_dup(transcripts, threshold, df_cap).select("a", "b")
    return components_from_pairs(pairs, max_iters=max_iters, id_col="conv_id")
