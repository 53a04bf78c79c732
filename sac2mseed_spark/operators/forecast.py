"""Seasonal-naive forecast error over tier series.

The cheapest useful forecast for a seasonal series is "same value one
season ago" (seasonal-naive); its error profile is the standard
baseline every fancier model must beat, and per-conversation MAE/RMSE
against it is a one-pass health metric for rate monitoring (a conv
whose hourly pattern repeats has tiny error; a drifting conv does
not). Complements operators/autocorr.py: ACF measures self-similarity
at row lags, this measures it at CALENDAR lags with exact window
alignment.

Float-determinism design: prediction and actual are integer window
sums, so the per-pair error e = x − x_prev_season is exact int64, and
Σ|e|, Σe², n are exact integer aggregates; MAE = Σ|e|/n and
RMSE = √(Σe²/n) are derived by one canonical expression mirrored in
the DuckDB oracle.

Scale shape: a single self-equi-join on (key, window − season) — both
sides are the same tier partitioned by key, so the join co-partitions
on the shuffle key and AQE keeps it local; no window functions, no
explode. At 100 TB the tier table is bucketed by conv_id and this is a
bucket-local join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seasonal_naive_error(
    tier: DataFrame,
    season_us: int = 86_400_000_000,
    value_col: str = "sum_tokens",
    key_col: str = "conv_id",
    order_col: str = "window_start_us",
    min_pairs: int = 4,
) -> DataFrame:
    """Per-key MAE/RMSE of the value-one-season-ago forecast.

    Only windows whose season-ago window was OBSERVED form pairs
    (missing windows are a gap-fill concern, not a forecast-error
    one). Returns (key, n_pairs, mae, rmse) for keys with at least
    ``min_pairs`` aligned pairs, both metrics rounded 6dp.
    """
    if season_us <= 0:
        raise ValueError(f"season_us must be positive, got {season_us}")
    if min_pairs < 1:
        raise ValueError(f"min_pairs must be >= 1, got {min_pairs}")

    cur = tier.select(
        F.col(key_col),
        F.col(order_col).alias("__w"),
        F.col(value_col).cast("long").alias("__x"),
    )
    prev = tier.select(
        F.col(key_col),
        (F.col(order_col) + F.lit(season_us)).alias("__w"),
        F.col(value_col).cast("long").alias("__p"),
    )
    pairs = cur.join(prev, [key_col, "__w"], "inner").select(
        key_col,
        (F.col("__x") - F.col("__p")).alias("__e"),
    )
    agg = pairs.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.abs(F.col("__e"))).alias("__sae"),
        F.sum(F.col("__e") * F.col("__e")).alias("__sse"),
    )
    n = F.col("n_pairs").cast("double")
    return agg.filter(F.col("n_pairs") >= min_pairs).select(
        key_col,
        "n_pairs",
        F.round(F.col("__sae").cast("double") / n, 6).alias("mae"),
        F.round(F.sqrt(F.col("__sse").cast("double") / n), 6).alias("rmse"),
    )
