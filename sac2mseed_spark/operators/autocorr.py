"""Lag-k autocorrelation (ACF) over tier series.

The reference's gap/rate reports characterize a trace's regularity
qualitatively (/root/reference/src/sac2mseed.c summary paths); the
relational generalization every time-series store ships is the sample
autocorrelation function: for each conversation's windowed series,
Pearson r between the series and itself shifted by k OBSERVED windows,
for a small set of lags. High ACF at lag 24 on an hourly tier is the
diurnal-pattern detector; near-zero ACF everywhere is the Poisson/no-
memory signature the burstiness report complements.

Float-determinism design (same discipline as operators/anomaly.py): all
window/aggregate arithmetic stays on INTEGER columns — per (conv, lag)
we sum n, Σx, Σy, Σxy, Σx², Σy² as exact int64 (engine aggregation
ORDER cannot change an integer sum), then derive

    r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²ᵗ)·(n·Σy² − Σy²ᵗ))

from those exact integers through ONE canonical literal expression
mirrored in the DuckDB oracle, so IEEE yields identical doubles.
Products stay integer until the final cast: at tier magnitudes
(window sums ≤ ~10⁵, ≤ ~10⁵ windows/conv) n·Σx² ≤ ~10²⁰ would overflow,
so the two variance products and the covariance numerator are computed
on DOUBLE-cast sums — each sum is an exact integer < 2⁵³, and the
oracle casts at the same points, so the doubles still match bitwise.

Scale shape: one shuffle by conv (the lag window partition), a single
window pass computing ALL requested lags, one explode (fan-out = len
(lags), a small constant), one groupBy (conv, lag). No self-join: the
lag columns make the pairing a map-side operation, so the plan is
shuffle(conv) → window → explode → partial agg → shuffle(conv, lag) →
final agg, which survives any scale the tier itself survives.

:func:`cross_correlation` shares the identical kernel with TWO value
columns of the same tier row — corr(x_t, y_{t-k}) tests whether y
LEADS x (e.g. does this hour's turn count predict next hour's
latency), again with no join: both series ride the same row.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def autocorrelation(
    tier: DataFrame,
    lags: Sequence[int] = (1, 2, 3),
    value_col: str = "sum_tokens",
    key_col: str = "conv_id",
    order_col: str = "window_start_us",
    min_pairs: int = 8,
) -> DataFrame:
    """Sample ACF per (key, lag) over observed windows.

    Lags are ROWS over observed windows (a silent conv resumes against
    its last points — same framing as the trailing z-score monitor),
    not calendar offsets; the seasonal-naive operator covers the
    calendar-aligned variant. Returns (key, lag, n_pairs, acf) for
    every pair set with ``n_pairs >= min_pairs`` and nonzero variance
    on both sides; acf rounded 6dp.
    """
    lags = sorted(set(int(j) for j in lags))
    if not lags or lags[0] < 1:
        raise ValueError(f"lags must be positive ints, got {lags!r}")
    return _lagged_correlation(
        tier, value_col, value_col, lags, key_col, order_col,
        min_pairs, "acf",
    )


def cross_correlation(
    tier: DataFrame,
    x_col: str,
    y_col: str,
    lags: Sequence[int] = (0, 1, 2),
    key_col: str = "conv_id",
    order_col: str = "window_start_us",
    min_pairs: int = 8,
) -> DataFrame:
    """Lagged cross-correlation per (key, lag): corr(x_t, y_{t-lag}).

    Lag 0 is the contemporaneous correlation; positive lags test
    whether past y predicts present x (y LEADS x). Same integer-sum
    float discipline and plan shape as :func:`autocorrelation` — the
    two series are columns of the SAME tier row, so no join is ever
    needed to pair them. Returns (key, lag, n_pairs, ccf).
    """
    lags = sorted(set(int(j) for j in lags))
    if not lags or lags[0] < 0:
        raise ValueError(f"lags must be >= 0, got {lags!r}")
    return _lagged_correlation(
        tier, x_col, y_col, lags, key_col, order_col, min_pairs, "ccf"
    )


def _lagged_correlation(
    tier: DataFrame,
    x_col: str,
    y_col: str,
    lags: Sequence[int],
    key_col: str,
    order_col: str,
    min_pairs: int,
    out_name: str,
) -> DataFrame:
    if min_pairs < 2:
        raise ValueError(f"min_pairs must be >= 2, got {min_pairs}")

    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    w = Window.partitionBy(key_col).orderBy(order_col)
    staged = tier.select(
        F.col(key_col),
        x.alias("__x"),
        *[F.lag(y, j).over(w).alias(f"__y{j}") for j in lags],
    )
    pairs = (
        staged.select(
            key_col,
            "__x",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).cast("long").alias("lag"),
                            F.col(f"__y{j}").alias("y"),
                        )
                        for j in lags
                    ]
                )
            ).alias("__p"),
        )
        .select(
            key_col,
            F.col("__p.lag").alias("lag"),
            F.col("__x").alias("x"),
            F.col("__p.y").alias("y"),
        )
        .filter(F.col("y").isNotNull())
    )
    agg = pairs.groupBy(key_col, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("x").alias("__sx"),
        F.sum("y").alias("__sy"),
        F.sum(F.col("x") * F.col("y")).alias("__sxy"),
        F.sum(F.col("x") * F.col("x")).alias("__sxx"),
        F.sum(F.col("y") * F.col("y")).alias("__syy"),
    )
    # canonical float derivation — cast each exact-int sum once, then one
    # fixed expression shape (mirrored verbatim in the oracle SQL)
    n = F.col("n_pairs").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    return (
        agg.filter(F.col("n_pairs") >= min_pairs)
        .select(
            key_col,
            "lag",
            "n_pairs",
            (cov / F.sqrt(vx * vy)).alias("__r"),
            vx.alias("__vx"),
            vy.alias("__vy"),
        )
        .filter((F.col("__vx") > 0) & (F.col("__vy") > 0))
        .select(
            key_col,
            "lag",
            "n_pairs",
            F.round("__r", 6).alias(out_name),
        )
    )
