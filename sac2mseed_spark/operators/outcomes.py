"""Conversation outcome report: who got the last word, and when.

The triage view for curation and ops: a conversation whose LAST turn
is a user turn ended unanswered (abandonment or outage — candidates
for the validation error channel); one that ends on a tool turn died
mid-action. Duration and turn count come along for free.

The last turn is selected with the same reversed row_number folded
into a hash aggregate that ohlc_bars uses for close — no join-back,
no orderBy+limit per group. ``ended_answered`` is an int (0/1) so the
column hashes identically across engines.

Scale shape: one conv-partitioned window sort (the metrics exchange
again) + one hash aggregate on its prefix. Nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conv_outcomes(metrics: DataFrame) -> DataFrame:
    """Per-conversation ending summary.

    Returns (conv_id, n_turns, duration_us, last_role,
    ended_answered) where ended_answered = 1 iff the final turn's
    role is 'assistant'.
    """
    w = Window.partitionBy("conv_id").orderBy(
        F.col("turn_idx").desc(), F.col("ts_us").desc()
    )
    return (
        metrics.select("conv_id", "turn_idx", "ts_us", "role")
        .withColumn("__rnd", F.row_number().over(w))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
            F.max(F.when(F.col("__rnd") == 1, F.col("role"))).alias(
                "last_role"
            ),
        )
        .withColumn(
            "ended_answered",
            F.when(F.col("last_role") == "assistant", 1)
            .otherwise(0)
            .cast("int"),
        )
    )
