"""Active/idle time split per conversation (gap-threshold utilization).

An ops view of the same inter-turn gaps the sessionizer thresholds
(operators/sessionize.py): every gap contributes its first
``idle_after_s`` seconds to ACTIVE time (the participants were
engaged) and the remainder to IDLE time (the conversation sat). The
utilization ratio active/(active+idle) is the per-conversation duty
cycle — low values mark abandoned-and-resumed conversations that a
curation pass may want to split or drop.

All sums are exact int64 µs (least/greatest on integers); the ratio
is ONE float division rounded 6dp — the operators/anomaly.py
determinism discipline.

Scale shape: the latency column already exists on the per-turn
metrics (computed on the conv-partitioned lag exchange), so this is
one conditional hash aggregate per conversation on that same
partitioning — map-side partials do all the work, nothing else
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def utilization(
    metrics: DataFrame,
    idle_after_s: int = 300,
) -> DataFrame:
    """Per-conversation active/idle µs split and duty cycle.

    Returns (conv_id, n_gaps, active_us, idle_us, utilization) for
    conversations with >= 1 gap of nonzero total duration (a
    single-turn conversation has no gaps and no defined duty cycle).
    """
    if idle_after_s <= 0:
        raise ValueError(f"idle_after_s must be > 0, got {idle_after_s}")
    thr = F.lit(int(idle_after_s) * 1_000_000)

    gap = F.col("latency_us")
    # the first turn's NULL gap must not reach least()/greatest():
    # both Spark and DuckDB skip NULL args there, so least(NULL, thr)
    # is thr — a phantom active contribution — not NULL
    agg = metrics.filter(gap.isNotNull()).groupBy("conv_id").agg(
        F.count(gap).alias("n_gaps"),
        F.sum(F.least(gap, thr)).alias("active_us"),
        F.sum(F.greatest(gap - thr, F.lit(0))).alias("idle_us"),
    )
    total = F.col("active_us") + F.col("idle_us")
    return (
        agg.filter((F.col("n_gaps") >= 1) & (total > 0))
        .withColumn(
            "utilization",
            F.round(F.col("active_us").cast("double") / total.cast("double"), 6),
        )
    )
