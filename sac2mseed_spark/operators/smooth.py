"""Bounded-kernel EWMA smoothing over tier series.

The reference smooths nothing itself, but its summary/autoscale paths
derive per-trace statistics streams (/root/reference/src/sac2mseed.c
summary reports); the standard next step a monitoring pipeline takes is
exponential smoothing. A true infinite-memory EWMA is a sequential
recurrence (different engines associate the float ops differently), so
for bit-replayable cross-engine parity this operator uses the BOUNDED
kernel form: over the trailing K observed windows,

    ewma = sum_{j=0..K-1} a^j * x_{n-j}  /  sum_{j=0..K-1} a^j

computed as an explicit lag-chain so both engines evaluate the SAME
expression tree over the SAME exact int64 inputs — no frame-aggregation
order enters at all. With a = 0.5 every weight is an exact binary
fraction, so products are exact halvings and the only rounding is the
final division + 6dp round, identical in IEEE everywhere.

Scale shape: one shuffle by conv (the window partition), K lag()
columns over one rows-frame sort — no self-join, no explode; the lag
chain is whole-stage-codegen'd. Rows without a full K-history are
dropped (cnt filter), mirroring the anomaly operator's contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma_smooth(
    tier: DataFrame,
    k: int = 8,
    alpha: float = 0.5,
    value_col: str = "sum_tokens",
    key_col: str = "conv_id",
    order_col: str = "window_start_us",
) -> DataFrame:
    """Trailing bounded-kernel EWMA of integer ``value_col``.

    Returns (key, window_start, value, ewma) for every point with K-1
    preceding observed windows; ewma rounded 6dp.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    w = Window.partitionBy(key_col).orderBy(order_col)
    v = F.col(value_col).cast("long")
    staged = tier.select(
        F.col(key_col),
        F.col(order_col),
        v.alias("value"),
        *[F.lag(v, j).over(w).alias(f"__l{j}") for j in range(1, k)],
    )
    # identical literal expression shape in the oracle SQL: weighted sum
    # of value, lag1..lag(k-1) with float literal weights, / weight sum
    num = F.col("value").cast("double") * F.lit(1.0)
    wsum = 1.0
    for j in range(1, k):
        wj = alpha**j
        num = num + F.col(f"__l{j}").cast("double") * F.lit(wj)
        wsum += wj
    keep = F.col(f"__l{k-1}").isNotNull() if k > 1 else F.lit(True)
    return (
        staged.filter(keep)
        .select(
            key_col,
            order_col,
            "value",
            F.round(num / F.lit(wsum), 6).alias("ewma"),
        )
    )
