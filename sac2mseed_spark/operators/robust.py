"""Median/MAD robust outlier detection over rollup tiers.

The trailing z-score detector (operators/anomaly.py) uses mean/std,
which a single huge window drags toward itself — the classic masking
failure. The robust variant scores each window against its
conversation's MEDIAN and median-absolute-deviation: breakdown point
0.5, so up to half the windows can be wild before the detector loses
calibration. 0.6745 rescales MAD to sigma-equivalents for a normal
bulk (the textbook constant), so ``tau`` means the same thing in both
detectors.

Float-determinism design: the tier value is an exact int64; Spark's
sort-based exact ``percentile`` and DuckDB's ``quantile_cont`` both
linear-interpolate, and over integers the median is a half-integer —
exactly representable — so med, the absolute deviations (half-int),
and MAD (quarter-int) are BIT-equal across engines; the robust z is
then ONE identically-written float expression, rounded 6dp.

Scale shape: two aggregates and two joins, all keyed on conv_id —
Catalyst reuses a single hash partitioning for the whole chain, and
the join sides are per-conv 1-row summaries. The exact percentile is
a per-conv sort whose input is retention-bounded (windows per conv <=
horizon / tier width), so per-group memory is a design constant, not
a data-scale variable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_SIGMA = 0.6745


def robust_outliers(
    tier_df: DataFrame,
    value_col: str = "sum_tokens",
    tau: float = 3.5,
    min_windows: int = 8,
) -> DataFrame:
    """Windows whose |0.6745*(v - median)/MAD| >= tau within their
    conversation.

    Returns (conv_id, window_start_us, value, med, mad, rz) for
    flagged windows of conversations with >= min_windows windows and
    MAD > 0 (constant series are never anomalous, matching the
    variance guard in zscore_anomalies).
    """
    if min_windows < 2:
        raise ValueError(f"min_windows must be >= 2, got {min_windows}")

    v = F.col(value_col).cast("long")
    base = tier_df.select(
        "conv_id", "window_start_us", v.alias("value")
    )
    med = base.groupBy("conv_id").agg(
        F.percentile("value", F.lit(0.5)).alias("med"),
        F.count(F.lit(1)).alias("__n"),
    )
    with_med = base.join(med, "conv_id")
    mad = (
        with_med.withColumn(
            "__ad", F.abs(F.col("value").cast("double") - F.col("med"))
        )
        .groupBy("conv_id")
        .agg(F.percentile("__ad", F.lit(0.5)).alias("mad"))
    )
    rz = (
        F.lit(MAD_SIGMA)
        * (F.col("value").cast("double") - F.col("med"))
        / F.col("mad")
    )
    return (
        with_med.join(mad, "conv_id")
        .filter(F.col("__n") >= min_windows)
        .filter(F.col("mad") > 0)
        .withColumn("rz", F.round(rz, 6))
        .filter(F.abs(F.col("rz")) >= tau)
        .select("conv_id", "window_start_us", "value", "med", "mad", "rz")
    )
