"""Reset-aware counter rates over per-conversation token counters.

The reference advances a per-trace sample counter record-by-record and
detects discontinuities as gaps (/root/reference/libmseed/
traceutils.c:300-334); the monitoring-native generalization is the
PromQL ``rate()``/``increase()`` pair over a MONOTONE counter that may
RESET. Here the counter is the running token total within a session
segment (operators/sessionize): it climbs turn by turn and drops back
at every segment boundary, exactly the shape of a process restart
resetting a counter. The operator recovers per-turn increase with
reset handling — if the counter went down, the new value IS the
increase since the reset — and the corresponding per-minute rate.

Bit-stability: counter, previous counter and increase are exact int64
window sums/lags; the rate is a single IEEE expression
``increase * 60000000.0 / dt_us`` evaluated identically in Spark and
the DuckDB oracle (long->double promotion, one multiply, one divide),
rounded to 6dp in both.

Scale shape: one shuffle by conv_id; the segment-scoped running sum
and the conv-scoped lag share that partitioning (two window specs,
one exchange — the segment sort order is a prefix-compatible
refinement of the conv sort order). No joins, no explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sessionize import DEFAULT_GAP_TOLERANCE_US, sessionize


def counter_rate(
    metrics: DataFrame,
    gap_tolerance_us: int = DEFAULT_GAP_TOLERANCE_US,
) -> DataFrame:
    """Per-turn reset-aware counter increase and rate.

    Input: derive_turn_metrics output (conv_id, turn_idx, ts_us,
    token_count, ...). Returns every turn with a predecessor:
    (conv_id, turn_idx, ts_us, counter, increase, rate_per_min) where
    counter is the within-segment running token total, increase is
    reset-corrected, and rate_per_min is NULL when dt == 0.
    """
    seg = sessionize(metrics, gap_tolerance_us)
    wseg = (
        Window.partitionBy("conv_id", "segment_id")
        .orderBy("ts_us", "turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wconv = Window.partitionBy("conv_id").orderBy("ts_us", "turn_idx")
    staged = (
        seg.withColumn(
            "counter", F.sum(F.col("token_count").cast("long")).over(wseg)
        )
        .withColumn("prev_counter", F.lag("counter").over(wconv))
        .withColumn("prev_ts_us", F.lag("ts_us").over(wconv))
        .filter(F.col("prev_counter").isNotNull())
    )
    increase = F.when(
        F.col("counter") >= F.col("prev_counter"),
        F.col("counter") - F.col("prev_counter"),
    ).otherwise(F.col("counter"))
    dt = F.col("ts_us") - F.col("prev_ts_us")
    rate = F.when(
        dt > 0,
        F.round(increase * F.lit(60_000_000.0) / dt, 6),
    )
    return staged.select(
        "conv_id",
        "turn_idx",
        F.col("ts_us").cast("long").alias("ts_us"),
        "counter",
        increase.alias("increase"),
        rate.alias("rate_per_min"),
    )
