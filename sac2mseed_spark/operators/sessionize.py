"""Gap-tolerance sessionization — the MSTraceList segment model.

The reference maintains, per source id, a sorted list of continuous
segments, splitting where the inter-record gap exceeds a tolerance and
"healing" segments a new record bridges
(/root/reference/libmseed/tracelist.c:135-606, traceutils.c:268-421).

Spark-first equivalent: sort within conversation, gap test via lag, segment
id via running sum of gap-break flags. Because the whole stream is re-sorted
declaratively, out-of-order input needs no heal pass (mst_groupheal,
traceutils.c:776-915, becomes a no-op by construction) — tests assert
shuffled input yields identical segments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Default tolerance: the reference uses half a sample period
# (traceutils.c:287-296); for irregular turn streams we default to 30 min.
DEFAULT_GAP_TOLERANCE_US = 30 * 60 * 1_000_000


def sessionize(metrics: DataFrame, gap_tolerance_us: int = DEFAULT_GAP_TOLERANCE_US) -> DataFrame:
    """Attach segment_id: increments whenever the gap to the previous turn
    exceeds the tolerance. Requires ts_us (derive_turn_metrics).

    Single window spec over (conv_id) — one shuffle, reused for both lag and
    the running sum.
    """
    w = Window.partitionBy("conv_id").orderBy("ts_us", "turn_idx")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    is_break = F.when(gap > gap_tolerance_us, 1).otherwise(0)
    return metrics.withColumn(
        "segment_id",
        F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def segments(metrics: DataFrame, gap_tolerance_us: int = DEFAULT_GAP_TOLERANCE_US) -> DataFrame:
    """Per-segment coverage summary (SYNC-listing analogue,
    /root/reference/libmseed/traceutils.c:1442-1482)."""
    return (
        sessionize(metrics, gap_tolerance_us)
        .groupBy("conv_id", "segment_id")
        .agg(
            F.min("ts_us").alias("seg_start_us"),
            F.max("ts_us").alias("seg_end_us"),
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("token_count").alias("sum_tokens"),
        )
    )
