"""Per-conversation dispersion statistics (exact IQR + crest factor).

Descriptive spread of a tier value per conversation: exact
interpolated quartiles (q1/q3/IQR — the robust spread measure
robust_outliers' MAD complements), the integer-sum mean, the peak,
and the peak-to-average ratio (crest factor: how bursty the
conversation's load profile is — PAR near 1 is a flat hum, large PAR
is spike-driven).

Float-determinism design: quartiles of int64 values interpolate at
quarter positions, so results are quarter-integers — exactly
representable, bit-equal across Spark's sort-based ``percentile`` and
DuckDB's ``quantile_cont`` (the operators/robust.py argument, at 0.25
instead of 0.5). mean and PAR are single canonical float expressions
rounded 6dp.

Scale shape: ONE hash/sort aggregate per conversation on the tier
(never raw turns); per-group sort input is retention-bounded. No
joins, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dispersion_stats(
    tier_df: DataFrame,
    value_col: str = "value",
    min_windows: int = 4,
) -> DataFrame:
    """Per-conversation quartile spread and crest factor.

    Returns (conv_id, n_windows, q1, q3, iqr, mean, peak, par) for
    conversations with >= min_windows windows and a positive value
    sum (PAR needs a nonzero mean).
    """
    if min_windows < 2:
        raise ValueError(f"min_windows must be >= 2, got {min_windows}")

    v = F.col(value_col).cast("long")
    agg = tier_df.select("conv_id", v.alias("__v")).groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.percentile("__v", F.lit(0.25)).alias("q1"),
        F.percentile("__v", F.lit(0.75)).alias("q3"),
        F.sum("__v").alias("__s"),
        F.max("__v").alias("peak"),
    )
    mean = F.col("__s").cast("double") / F.col("n_windows").cast("double")
    par = F.col("peak").cast("double") / mean
    return (
        agg.filter(
            (F.col("n_windows") >= min_windows) & (F.col("__s") > 0)
        )
        .select(
            "conv_id",
            "n_windows",
            "q1",
            "q3",
            (F.col("q3") - F.col("q1")).alias("iqr"),
            F.round(mean, 6).alias("mean"),
            "peak",
            F.round(par, 6).alias("par"),
        )
    )
