"""OHLC (open/high/low/close) bars per conversation per window.

The financial-candlestick view of a turn metric: for each (conv_id,
window) the value of the FIRST turn, the max, the min, and the value
of the LAST turn. Open/close give the within-window drift that the
tier's min/max/sum columns (operators/rollup.py) deliberately do not
carry — the reference keeps first/last sample times per record
(msr_starttime/msr_endtime, `/root/reference/libmseed/msrutils.c`)
but never first/last VALUES; this operator adds them as a derived
tier.

Determinism: first/last are defined by the stable (ts_us, turn_idx)
order — unique per conversation — via two row_number directions, so
both engines select the same rows; all outputs are exact integers.

Scale shape: one conv-partitioned window sort; the groupBy that
follows aggregates on a PREFIX of the window's partition key, so
Catalyst chains it onto the same exchange (no second shuffle). The
conditional max(when(rn=1)) turns "first row's value" into an
ordinary hash aggregate instead of a join-back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .streaks import TIER_US


def ohlc_bars(
    metrics: DataFrame,
    tier: str = "1h",
    value_col: str = "token_count",
) -> DataFrame:
    """Per-(conv, window) OHLC bars of a per-turn integer metric.

    Returns (conv_id, window_start_us, open, high, low, close,
    n_points).
    """
    if tier not in TIER_US:
        raise ValueError(f"unknown tier {tier!r}")
    w_us = TIER_US[tier]

    v = F.col(value_col).cast("long")
    base = metrics.select(
        "conv_id",
        (F.floor(F.col("ts_us") / F.lit(w_us)) * F.lit(w_us))
        .cast("long")
        .alias("window_start_us"),
        F.col("ts_us"),
        F.col("turn_idx"),
        v.alias("__v"),
    )
    part = Window.partitionBy("conv_id", "window_start_us")
    asc = part.orderBy(F.col("ts_us").asc(), F.col("turn_idx").asc())
    desc = part.orderBy(F.col("ts_us").desc(), F.col("turn_idx").desc())
    return (
        base.withColumn("__rn", F.row_number().over(asc))
        .withColumn("__rnd", F.row_number().over(desc))
        .groupBy("conv_id", "window_start_us")
        .agg(
            F.max(F.when(F.col("__rn") == 1, F.col("__v"))).alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max(F.when(F.col("__rnd") == 1, F.col("__v"))).alias(
                "close"
            ),
            F.count(F.lit(1)).alias("n_points"),
        )
    )
