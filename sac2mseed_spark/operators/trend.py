"""Trailing-window OLS trend slope over tier series.

The reference's gap/rate analysis flags rate CHANGES between records
(/root/reference/libmseed/tracelist.c sample-rate tolerance checks);
the series-level generalization is the trailing least-squares slope:
for each (conv, window) point, fit value ~ a + b*x over the last k
observed windows (x = 0..k-1 frame position) and report b — the local
trend a capacity dashboard alerts on.

Bit-stability: with x fixed to the frame positions, the OLS slope is

    b = (k * Sxy - Sx * Sy) / (k * Sxx - Sx^2)

where Sx = k(k-1)/2 and Sxx = k(k-1)(2k-1)/6 are compile-time integer
constants and Sy, Sxy are INTEGER dot products of the trailing values
with integer coefficients — computed here as an explicit lag-chain (no
frame aggregation, no engine-specific float order), so the single final
float division is IEEE-identical in every engine.

Scale shape: one shuffle by conv, k lag() columns over one sort —
whole-stage codegen, no self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trend_slope(
    tier: DataFrame,
    k: int = 8,
    value_col: str = "sum_tokens",
    key_col: str = "conv_id",
    order_col: str = "window_start_us",
) -> DataFrame:
    """Trailing-k OLS slope of integer ``value_col`` per key.

    Returns (key, window_start, value, slope) for every point with k-1
    preceding observed windows; slope in value-units per window, 6dp.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    w = Window.partitionBy(key_col).orderBy(order_col)
    v = F.col(value_col).cast("long")
    # lag j holds x-position (k-1-j): current row is the frame's last x
    staged = tier.select(
        F.col(key_col),
        F.col(order_col),
        v.alias("value"),
        *[F.lag(v, j).over(w).alias(f"__l{j}") for j in range(1, k)],
    ).filter(F.col(f"__l{k-1}").isNotNull())
    sy = F.col("value")
    sxy = F.col("value") * F.lit(k - 1)
    for j in range(1, k):
        sy = sy + F.col(f"__l{j}")
        sxy = sxy + F.col(f"__l{j}") * F.lit(k - 1 - j)
    sx = k * (k - 1) // 2
    sxx = k * (k - 1) * (2 * k - 1) // 6
    denom = float(k * sxx - sx * sx)
    num = (F.lit(k) * sxy - F.lit(sx) * sy).cast("double")
    return staged.select(
        key_col,
        order_col,
        "value",
        F.round(num / F.lit(denom), 6).alias("slope"),
    )
