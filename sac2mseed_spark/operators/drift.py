"""Per-conversation verbosity drift (whole-stream OLS on turn index).

Does a conversation get wordier or terser as it runs? OLS of
token_count against turn_idx over the conversation's whole turn
stream — the per-conversation complement of the trailing tier-window
trend (operators/trend.py): trend watches a metric move through TIME,
drift regresses against turn POSITION, which is what verbosity
burnout / warm-up actually correlates with.

Float-determinism design: the classic integer normal equations —
slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²),
intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²) —
with every sum and product an exact int64 and ONE float division
each, rounded 6dp. turn_idx is dense 0..n−1, so the largest product
n·Σx² ≈ n⁴/3 — exact for conversations up to ~7·10⁴ turns; past
that Spark wraps while DuckDB promotes, so longer streams must
center x first or merge chunked partials (same coarsening discipline
as operators/anomaly.py).

Scale shape: one hash aggregate per conversation over the per-turn
metrics — map-side partials do all the work; no window, no join, no
sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def verbosity_drift(metrics: DataFrame, min_turns: int = 8) -> DataFrame:
    """Per-conversation OLS slope/intercept of token_count on turn_idx.

    Returns (conv_id, n_turns, slope, intercept) for conversations
    with >= min_turns turns (the denominator is positive whenever
    n >= 2 and turn indexes are distinct, which they are by schema).
    """
    if min_turns < 2:
        raise ValueError(f"min_turns must be >= 2, got {min_turns}")

    x = F.col("turn_idx").cast("long")
    y = F.col("token_count").cast("long")
    agg = metrics.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double") / den
    intercept = (
        F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    ).cast("double") / den
    return (
        agg.filter(F.col("n") >= min_turns)
        .select(
            "conv_id",
            F.col("n").alias("n_turns"),
            F.round(slope, 6).alias("slope"),
            F.round(intercept, 6).alias("intercept"),
        )
    )
