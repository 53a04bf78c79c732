"""Hour-of-day baseline anomaly detection (seasonal z-score).

The third leg of the anomaly family: zscore_anomalies scores a window
against its conversation's RECENT past (trailing frame),
robust_outliers against its conversation's TYPICAL level (median/MAD)
— this one scores it against the CORPUS's diurnal rhythm: the mean
and variance of the value over every window sharing its hour-of-day.
A 3 a.m. latency spike that would be normal at peak load is anomalous
against the 3 a.m. baseline.

Float-determinism design (operators/anomaly.py discipline): per-hod
n/Σv/Σv² are exact int64 sums and mean/var/z are the canonical float
expression, mirrored verbatim in the oracle. Callers floor the value
to a coarse-enough unit that n·v² stays inside int64 (seconds here;
at extreme corpus sizes coarsen further or pre-aggregate per shard
and merge the integer partials — same knob the trailing detector
documents).

Scale shape: the baseline is ONE hash aggregate to 24 rows, then a
broadcast join back onto the tier — no second full-data shuffle and
no window function at all. The 24-row baseline is also exactly what
an incremental maintenance pass would keep as running integer totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOUR_US = 3_600_000_000


def seasonal_anomalies(
    tier_df: DataFrame,
    value_col: str = "value",
    tau: float = 3.0,
    min_per_hod: int = 24,
) -> DataFrame:
    """Windows whose value deviates >= tau sigma from the global
    hour-of-day baseline.

    Returns (conv_id, window_start_us, hod, value, z) for hours of
    day with >= min_per_hod observations and positive variance; z is
    rounded 6dp.
    """
    if min_per_hod < 2:
        raise ValueError(f"min_per_hod must be >= 2, got {min_per_hod}")

    v = F.col(value_col).cast("long")
    base = tier_df.select(
        "conv_id",
        "window_start_us",
        F.pmod(
            (F.col("window_start_us") / F.lit(HOUR_US)).cast("long"),
            F.lit(24),
        )
        .cast("int")
        .alias("hod"),
        v.alias("value"),
    )
    bl = base.groupBy("hod").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("value").alias("__s"),
        F.sum(F.col("value") * F.col("value")).alias("__ss"),
    )
    mean = F.col("__s").cast("double") / F.col("__n").cast("double")
    var = (
        F.col("__ss").cast("double") / F.col("__n").cast("double")
        - mean * mean
    )
    z = (F.col("value").cast("double") - mean) / F.sqrt(var)
    return (
        base.join(F.broadcast(bl), "hod")
        .filter(F.col("__n") >= min_per_hod)
        .withColumn("__var", var)
        .filter(F.col("__var") > 0)
        .withColumn("z", F.round(z, 6))
        .filter(F.abs(F.col("z")) >= tau)
        .select("conv_id", "window_start_us", "hod", "value", "z")
    )
