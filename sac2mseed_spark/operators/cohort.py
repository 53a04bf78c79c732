"""Daily cohort retention over conversations.

The standard product-analytics rollup a transcript warehouse serves:
cohort = the day a conversation was first seen; for each (cohort_day,
active_day) pair, how many of the cohort's conversations had at least
one turn that day, and what fraction of the cohort that is. Age 0 is
the cohort day itself (rate 1.0 by construction — kept as the sanity
row).

Float-determinism design: counts are exact distinct-day/conv
aggregates; the rate is ONE double division of two int64 counts,
rounded 6dp (operators/diversity.py discipline — no logs, no
accumulation).

Scale shape: three aggregations, each shrinking the data — (conv,
day) distinct at turn volume, conv → cohort-day min reusing the conv
shuffle, then (cohort_day, active_day) counts at conv-day volume. The
cohort-size side of the final join is one row per DAY — broadcast.
At 100 TB the only big shuffle is the first (conv, day) distinct,
which is the same key family every other operator shuffles on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DAY_US = 86_400_000_000


def cohort_retention(
    metrics: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """(cohort_day_us, active_day_us, age_days, n_active, cohort_size,
    retention_rate) for every observed (cohort, active) day pair."""
    day = (
        F.floor(F.col(ts_col).cast("long") / F.lit(float(DAY_US))).cast(
            "long"
        )
        * F.lit(DAY_US)
    ).alias("active_day_us")
    conv_days = metrics.select(F.col(key_col), day).distinct()
    w = Window.partitionBy(key_col)
    with_cohort = conv_days.select(
        key_col,
        "active_day_us",
        F.min("active_day_us").over(w).alias("cohort_day_us"),
    )
    active = with_cohort.groupBy("cohort_day_us", "active_day_us").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    sizes = (
        with_cohort.filter(
            F.col("active_day_us") == F.col("cohort_day_us")
        )
        .groupBy("cohort_day_us")
        .agg(F.count(F.lit(1)).alias("cohort_size"))
    )
    return active.join(F.broadcast(sizes), "cohort_day_us").select(
        "cohort_day_us",
        "active_day_us",
        (
            (F.col("active_day_us") - F.col("cohort_day_us"))
            / F.lit(DAY_US)
        )
        .cast("long")
        .alias("age_days"),
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active").cast("double")
            / F.col("cohort_size").cast("double"),
            6,
        ).alias("retention_rate"),
    )
