"""Diurnal seasonality profile: per hour-of-day activity statistics.

The reference's trace summaries aggregate per calendar unit
(/root/reference/src/sac2mseed.c daily summary lines); the seasonality
view a transcript fleet wants is the diurnal profile — average load by
hour-of-day and role, the shape capacity planning and anomaly baselines
are built on.

One hash aggregate on (hour, role); integer sums + counts, ratios
derived by a single float division each — the usual engine-order-proof
discipline. Hour-of-day extraction is UTC under the pinned session TZ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_profile(metrics: DataFrame) -> DataFrame:
    """Average tokens / latency and turn counts by (hour-of-day, role).

    Returns (hour, role, n_turns, sum_tokens, avg_tokens,
    avg_latency_s) rounded 6dp. The latency average is reported in
    SECONDS: cross-gap averages reach ~1e10 µs, where a 6dp round is
    below double resolution and engines disagree in the last ulp —
    dividing by 1e6 first keeps the round representable.
    """
    h = F.hour(F.timestamp_micros(F.col("ts_us"))).alias("hour")
    return (
        metrics.groupBy(h, "role")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("token_count").alias("sum_tokens"),
            F.count("latency_us").alias("__nl"),
            F.sum("latency_us").alias("__sl"),
        )
        .select(
            "hour",
            "role",
            "n_turns",
            "sum_tokens",
            F.round(F.col("sum_tokens") / F.col("n_turns"), 6).alias("avg_tokens"),
            F.round(
                F.when(
                    F.col("__nl") > 0,
                    F.col("__sl") / F.col("__nl") / F.lit(1000000.0),
                ),
                6,
            ).alias("avg_latency_s"),
        )
    )
