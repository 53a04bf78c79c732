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
