"""CUSUM changepoint detection over tier series.

The reference flags rate changes between adjacent traces as new
segments (mst_findadjacent tolerance, /root/reference/libmseed/
tracelist.c); the series-level generalization is the classic CUSUM
statistic: for a conversation's windowed series x_1..x_n with mean m,
the centered prefix sums D_i = Σ_{t<=i} x_t − i·m trace a bridge that
stays near zero for a stationary series and bows out when the level
shifts; the argmax of |D_i| estimates the change location and
max|D_i| / (σ·√n) is the (null-calibrated) test statistic.

Float-determinism design (operators/anomaly.py discipline): the prefix
sum Σ_{t<=i} x_t, the row index i, and the conv totals (n, S=Σx,
SS=Σx²) are all exact int64 window aggregates — running integer sums
are order-defined and exact in both engines. The floats are derived
from those integers by one canonical expression mirrored in the DuckDB
oracle: m = S/n, D_i = cum − i·m, σ² = SS/n − m², stat = max|D|/(σ√n).
The argmax row is selected by ordering on (|D| desc, window asc): |D|
values are bit-identical doubles in both engines, so the ordering —
including float ties, broken by the integer window — is identical.

Scale shape: ONE shuffle by conv; every aggregate (running cum, full-
partition totals, the argmax row_number) is a window over that same
partitioning, so Catalyst runs them in consecutive Window nodes over a
single exchange. No self-join, no groupBy-then-rejoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_changepoints(
    tier: DataFrame,
    tau: float = 1.5,
    value_col: str = "sum_tokens",
    key_col: str = "conv_id",
    order_col: str = "window_start_us",
    min_windows: int = 8,
) -> DataFrame:
    """Most-likely changepoint per key, where the CUSUM stat >= tau.

    Returns one row per key with at least ``min_windows`` observed
    windows, nonzero variance, and max|D|/(σ√n) >= tau:
    (key, cp_window_start_us, n_windows, cusum_stat, level_before,
    level_after) — the levels are the mean value left/right of the
    estimated changepoint (inclusive left), rounded 6dp like the stat.
    """
    if min_windows < 4:
        raise ValueError(f"min_windows must be >= 4, got {min_windows}")

    x = F.col(value_col).cast("long")
    wp = Window.partitionBy(key_col)
    wo = wp.orderBy(order_col)
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    staged = tier.select(
        F.col(key_col),
        F.col(order_col),
        x.alias("__x"),
    ).select(
        key_col,
        order_col,
        "__x",
        F.row_number().over(wo).alias("__i"),
        F.sum("__x").over(run).alias("__cum"),
        F.count("__x").over(wp).alias("__n"),
        F.sum("__x").over(wp).alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).over(wp).alias("__ss"),
    )
    # canonical float chain from exact ints (mirrored in the oracle)
    n = F.col("__n").cast("double")
    m = F.col("__s").cast("double") / n
    var = F.col("__ss").cast("double") / n - m * m
    d = F.col("__cum").cast("double") - F.col("__i").cast("double") * m
    scored = staged.select(
        key_col,
        order_col,
        "__i",
        "__cum",
        "__n",
        "__s",
        F.abs(d).alias("__absd"),
        var.alias("__var"),
    ).filter((F.col("__n") >= min_windows) & (F.col("__var") > 0))
    pick = Window.partitionBy(key_col).orderBy(
        F.col("__absd").desc(), F.col(order_col).asc()
    )
    best = scored.select(
        key_col,
        order_col,
        "__i",
        "__cum",
        "__n",
        "__s",
        "__absd",
        "__var",
        F.row_number().over(pick).alias("__rk"),
    ).filter(F.col("__rk") == 1)
    nn = F.col("__n").cast("double")
    stat = F.col("__absd") / (F.sqrt(F.col("__var")) * F.sqrt(nn))
    before = F.col("__cum").cast("double") / F.col("__i").cast("double")
    after = (F.col("__s") - F.col("__cum")).cast("double") / (
        F.col("__n") - F.col("__i")
    ).cast("double")
    return (
        best.select(
            key_col,
            F.col(order_col).alias("cp_window_start_us"),
            F.col("__n").alias("n_windows"),
            stat.alias("__stat"),
            before.alias("__before"),
            # the argmax can land on the last row (i == n); the right
            # side is then empty and its level is NULL, not 0/0
            F.when(F.col("__i") < F.col("__n"), after).alias("__after"),
        )
        .filter(F.col("__stat") >= tau)
        .select(
            key_col,
            "cp_window_start_us",
            "n_windows",
            F.round("__stat", 6).alias("cusum_stat"),
            F.round("__before", 6).alias("level_before"),
            F.round("__after", 6).alias("level_after"),
        )
    )
