"""Inter-arrival burstiness statistics per conversation.

The reference's timing analysis treats a trace as an (almost) regular
grid and reports deviations as gaps (/root/reference/libmseed/
traceutils.c:268-334). Transcript streams are the opposite —
fundamentally irregular — so the first-class question is HOW irregular:
the squared coefficient of variation of inter-arrival gaps (CV^2 = 1
for Poisson, > 1 bursty, < 1 pacemaker-regular) and the Fano factor of
per-minute counts over the conversation's observed span (variance /
mean of counts, zeros included). Both are standard point-process
burstiness measures (Barabasi, "The origin of bursts and heavy tails
in human dynamics", Nature 435, 2005).

Bit-stability: both statistics are assembled from exact int64 sums
(n, sum(g), sum(g^2) with gaps floored to whole seconds; window counts
and their squares from the 1m tier) and finished with ONE float
expression written identically in Spark and the DuckDB oracle.
Products that could overflow int64 (n * sum_sq) are promoted to double
BEFORE multiplying, in the same order in both engines. Empty-minute
windows contribute zero to both sum(c) and sum(c^2), so the Fano
numerator needs only the conversation's span (W windows) — no
zero-filling join.

Scale shape: two aggregations of the same conv-partitioned scan (gap
stats from the turn stream, count-square stats from the 1m tier) and
one join on conv_id — both sides already hash-partitioned by conv_id
from their groupBys, so AQE plans a shuffle-free sort-merge. No
explode, no zero-fill materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def burstiness(metrics: DataFrame) -> DataFrame:
    """Per-conversation CV^2 of inter-arrival gaps and per-minute Fano.

    Returns (conv_id, n_turns, n_gaps, sum_gap_s, cv2, fano); cv2 is
    NULL for conversations with < 2 gaps or an all-zero gap sum.
    """
    w = Window.partitionBy("conv_id").orderBy("ts_us", "turn_idx")
    gap_us = F.col("ts_us") - F.lag("ts_us").over(w)
    gap_s = F.floor(gap_us / F.lit(1_000_000.0)).cast("long")
    g = (
        metrics.select("conv_id", "ts_us", "turn_idx")
        .withColumn("gap_s", gap_s)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.count("gap_s").alias("n_gaps"),
            F.sum("gap_s").alias("sum_gap_s"),
            F.sum(F.col("gap_s") * F.col("gap_s")).alias("sum_gap_sq"),
        )
    )
    win = (
        F.floor(F.col("ts_us").cast("long") / F.lit(60_000_000.0)).cast("long")
        * F.lit(60_000_000)
    ).alias("w")
    t1m = (
        metrics.select("conv_id", win)
        .groupBy("conv_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("conv_id")
        .agg(
            F.sum("c").alias("n_pts"),
            F.sum(F.col("c") * F.col("c")).alias("sum_cnt_sq"),
            F.min("w").alias("first_win_us"),
            F.max("w").alias("last_win_us"),
        )
    )
    joined = g.join(t1m, "conv_id")
    n_win = (
        (F.col("last_win_us") - F.col("first_win_us")) / F.lit(60_000_000)
    ).cast("long") + F.lit(1)
    cv2 = F.when(
        (F.col("n_gaps") >= 2) & (F.col("sum_gap_s") > 0),
        F.round(
            (
                F.col("n_gaps").cast("double") * F.col("sum_gap_sq").cast("double")
                - (F.col("sum_gap_s") * F.col("sum_gap_s")).cast("double")
            )
            / (F.col("sum_gap_s") * F.col("sum_gap_s")).cast("double"),
            6,
        ),
    )
    fano = F.round(
        (
            n_win.cast("double") * F.col("sum_cnt_sq").cast("double")
            - (F.col("n_pts") * F.col("n_pts")).cast("double")
        )
        / (n_win.cast("double") * F.col("n_pts").cast("double")),
        6,
    )
    return joined.select(
        "conv_id",
        "n_turns",
        "n_gaps",
        "sum_gap_s",
        cv2.alias("cv2"),
        fano.alias("fano"),
    )
