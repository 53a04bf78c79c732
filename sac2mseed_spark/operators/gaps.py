"""Gap / overlap reporting — mst_printgaplist analogue.

Reference: per source id, gap between consecutive traces = next.start -
prev.end, with min/max-gap filters and a missing-sample estimate
(/root/reference/libmseed/traceutils.c:1500-1621). Here: lag over the
per-conversation turn stream (or over segment summaries), filtered by
threshold — one window shuffle, expression-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_report(
    metrics: DataFrame,
    min_gap_us: int | None = None,
    max_gap_us: int | None = None,
) -> DataFrame:
    """One row per inter-turn gap exceeding the filters.

    Negative gaps (timestamp regressions after stable ordering, i.e.
    duplicate/overlapping ts) are reported too, mirroring the reference's
    overlap clamp (traceutils.c:1554-1566).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts_us")
    df = metrics.select(
        "conv_id",
        "turn_idx",
        "ts_us",
        F.lag("ts_us").over(w).alias("prev_ts_us"),
        F.lag("turn_idx").over(w).alias("prev_turn_idx"),
    ).filter(F.col("prev_ts_us").isNotNull())
    df = df.withColumn("gap_us", F.col("ts_us") - F.col("prev_ts_us"))
    if min_gap_us is not None:
        df = df.filter((F.col("gap_us") >= min_gap_us) | (F.col("gap_us") < 0))
    if max_gap_us is not None:
        df = df.filter(F.col("gap_us") <= max_gap_us)
    return df.select(
        "conv_id", "prev_turn_idx", "turn_idx", "prev_ts_us", "ts_us", "gap_us"
    )
