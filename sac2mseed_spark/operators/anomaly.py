"""Trailing-window z-score anomaly detection over tier series.

The reference's summary reports flag irregular traces qualitatively
(gaps, overlaps, rate changes — /root/reference/src/sac2mseed.c summary
paths); the relational generalization every monitoring deployment runs
is the trailing z-score: for each (conv, window) point, score its value
against the mean/std of the PREVIOUS k observed windows of the same
conv, flag |z| >= tau.

Float-determinism design (the property that lets DuckDB replay this
bit-for-bit): the windowed aggregates are computed over INTEGER columns
only — count, sum(x), sum(x*x) are exact int64 in both engines
regardless of each engine's aggregation order (Spark running-frame vs
DuckDB segment tree — their float summation ORDERS differ, their
integer sums cannot). The mean/variance/z floats are then derived from
those exact integers by an identical literal expression, so IEEE gives
identical doubles. This is the same defined-order discipline as the
codec and similarity kernels, applied to window frames.

Scale shape: one shuffle by conv (the window partition), a rows-frame
running window per conv — no self-join, no explode. The frame is ROWS
(previous k OBSERVED windows), not a time range: a conv that goes
silent resumes scoring against its last k points, which is the behavior
a rate-change monitor wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_anomalies(
    tier: DataFrame,
    k: int = 12,
    tau: float = 3.0,
    value_col: str = "sum_tokens",
    key_col: str = "conv_id",
    order_col: str = "window_start_us",
) -> DataFrame:
    """Windows whose integer ``value_col`` deviates >= tau trailing sigmas.

    Returns (key, window_start, value, trail_mean, trail_std, z) for
    every point with a full k-window history and nonzero trailing
    variance; z rounded 6dp. Population std (divide by k) — the trailing
    block is the whole reference population, not a sample.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    v = F.col(value_col).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(-k, -1)
    )
    cnt = F.count(v).over(w)
    s = F.sum(v).over(w)
    ss = F.sum(v * v).over(w)
    staged = tier.select(
        F.col(key_col),
        F.col(order_col),
        v.alias("value"),
        cnt.alias("__cnt"),
        s.alias("__s"),
        ss.alias("__ss"),
    ).filter(F.col("__cnt") == k)
    # exact ints -> doubles via ONE canonical expression shape (mirrored
    # in the oracle SQL): mean = s/k; var = ss/k - (s/k)^2
    mean = F.col("__s").cast("double") / F.lit(float(k))
    var = F.col("__ss").cast("double") / F.lit(float(k)) - mean * mean
    scored = staged.select(
        key_col,
        order_col,
        "value",
        mean.alias("trail_mean"),
        F.sqrt(var).alias("trail_std"),
        ((F.col("value").cast("double") - mean) / F.sqrt(var)).alias("__z"),
        var.alias("__var"),
    ).filter(F.col("__var") > 0)
    return (
        scored.filter(F.abs(F.col("__z")) >= tau)
        .select(
            key_col,
            order_col,
            "value",
            F.round("trail_mean", 6).alias("trail_mean"),
            F.round("trail_std", 6).alias("trail_std"),
            F.round("__z", 6).alias("z"),
        )
    )
