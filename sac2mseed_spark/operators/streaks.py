"""Activity-streak detection over rollup tiers (gaps-and-islands).

A retention/engagement view the reference's SYNC coverage listing
(`/root/reference/src/sac2mseed.c` trace-coverage reporting) hints at
but never aggregates: for each conversation, how long is the longest
run of CONSECUTIVE active windows at a tier, how many distinct runs
are there, and when did the longest one start. "Active" = the window
exists in the tier (tiers only materialize windows with >= 1 turn, so
presence is the signal).

Classic gaps-and-islands: with the window's ordinal index
``idx = window_start_us / tier_us``, consecutive windows share the
constant ``idx - row_number()`` — one integer subtraction turns runs
into group keys, no self-join and no iterative logic.

Scale shape: the only full-data exchange is the conv-partitioned sort
for ``row_number`` (tier rows, not raw turns); the (conv, grp) count
and the per-conv summary reuse that partitioning (partial-agg chain),
and the final rank window runs over per-conv STREAK summaries — rows
= number of runs, already thousands of times smaller than the tier.
All arithmetic is integer; ties for the longest streak break to the
earliest start, so output is deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TIER_US = {
    "1m": 60_000_000,
    "1h": 3_600_000_000,
    "1d": 86_400_000_000,
}


def activity_streaks(tier_df: DataFrame, tier: str = "1h") -> DataFrame:
    """Per-conversation longest consecutive-window activity streak.

    ``tier_df`` is a rollup tier (needs conv_id, window_start_us).
    Returns (conv_id, n_windows, n_streaks, longest_streak,
    longest_start_us); longest-streak ties resolve to the earliest
    start.
    """
    if tier not in TIER_US:
        raise ValueError(f"unknown tier {tier!r}")
    w_us = TIER_US[tier]

    by_conv = Window.partitionBy("conv_id").orderBy("__idx")
    grouped = (
        tier_df.select(
            "conv_id",
            F.col("window_start_us"),
            (F.col("window_start_us") / F.lit(w_us))
            .cast("long")
            .alias("__idx"),
        )
        .withColumn("__grp", F.col("__idx") - F.row_number().over(by_conv))
        .groupBy("conv_id", "__grp")
        .agg(
            F.count(F.lit(1)).alias("__len"),
            F.min("window_start_us").alias("__start"),
        )
    )
    rank_w = Window.partitionBy("conv_id").orderBy(
        F.col("__len").desc(), F.col("__start").asc()
    )
    conv_w = Window.partitionBy("conv_id")
    return (
        grouped.select(
            "conv_id",
            F.sum("__len").over(conv_w).alias("n_windows"),
            F.count(F.lit(1)).over(conv_w).alias("n_streaks"),
            F.col("__len").alias("longest_streak"),
            F.col("__start").alias("longest_start_us"),
            F.row_number().over(rank_w).alias("__rk"),
        )
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
