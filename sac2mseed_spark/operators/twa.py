"""Time-weighted average rollup — exact LOCF apportionment to windows.

The fixed tiers (operators/rollup.py) average the SAMPLES in each
window, which is right for regularly-sampled data (the reference's
fixed-rate records, /root/reference/libmseed/msrutils.c samprate
model) but biased for irregular turn streams: a conversation that
emits 50 turns in one minute and then one turn 50 minutes later should
not weight that minute 50x in an hourly mean. The standard fix is the
time-weighted average over the last-observation-carried-forward step
function — each observation HOLDS until the next one arrives.

Semantics (exact, integer-domain until the final division):
  * per conversation, a turn's value holds for
    d = min(next_ts - ts, gap_tolerance) microseconds — the same
    tolerance cutoff the segment model uses (operators/sessionize.py),
    so a conversation is "off the air" during any gap the SYNC listing
    would split on, and the last turn holds for 0 (no closing
    observation);
  * the hold interval [ts, ts+d) is apportioned EXACTLY across the
    fixed windows it overlaps; weighted sums and covered time are
    integer microsecond arithmetic, bit-stable at any parallelism.

Spark-first shape: one lead() over the same (conv_id, ts, turn_idx)
window spec the metrics lag uses (exchange reused), then an
explode(sequence(first_win, last_win)) whose fan-out is the CONSTANT
ceil(tolerance/width)+1 — with the default 30 min tolerance a turn
covers at most 2 hourly windows — followed by one hash aggregate with
map-side partial combine. No join, no unbounded Generate: the blow-up
is bounded by configuration, not by data, so the plan holds at 10^12
turns (gated by tests/test_plans.py).

``twa`` is the single derived float (one division, 6 dp) per the
engine-wide float rule; everything else is integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sessionize import DEFAULT_GAP_TOLERANCE_US


def time_weighted_avg(
    metrics: DataFrame,
    width_us: int,
    value_col: str = "token_count",
    gap_tolerance_us: int = DEFAULT_GAP_TOLERANCE_US,
) -> DataFrame:
    """Per (conv_id, window) time-weighted average of ``value_col``.

    Returns (conv_id, window_start_us, sum_weighted, covered_us,
    n_segments, twa): the exact value x microseconds integral over the
    window, the microseconds the LOCF step function was live in it, the
    number of hold-segments touching it, and their quotient.
    """
    w = Window.partitionBy("conv_id").orderBy("ts_us", "turn_idx")
    seg = (
        metrics.select(
            "conv_id",
            "ts_us",
            "turn_idx",
            F.col(value_col).cast("long").alias("v"),
        )
        .withColumn("gap_us", F.lead("ts_us").over(w) - F.col("ts_us"))
        # least() skips NULLs on both engines, so the last turn (no lead)
        # must be dropped explicitly — it holds for 0, not for tolerance
        .withColumn(
            "d_us",
            F.when(
                F.col("gap_us").isNotNull(),
                F.least(
                    F.col("gap_us"), F.lit(gap_tolerance_us).cast("long")
                ),
            ),
        )
        .where(F.col("d_us") > 0)
    )
    first_w = (F.floor(F.col("ts_us") / width_us) * width_us).cast("long")
    last_w = (
        F.floor((F.col("ts_us") + F.col("d_us") - 1) / width_us) * width_us
    ).cast("long")
    exploded = seg.withColumn(
        "window_start_us",
        F.explode(F.sequence(first_w, last_w, F.lit(int(width_us)))),
    )
    ov = F.least(
        F.col("ts_us") + F.col("d_us"),
        F.col("window_start_us") + F.lit(int(width_us)),
    ) - F.greatest(F.col("ts_us"), F.col("window_start_us"))
    return (
        exploded.withColumn("ov_us", ov)
        .groupBy("conv_id", "window_start_us")
        .agg(
            F.sum(F.col("v") * F.col("ov_us")).alias("sum_weighted"),
            F.sum("ov_us").alias("covered_us"),
            F.count(F.lit(1)).alias("n_segments"),
        )
        .withColumn(
            "twa",
            F.round(F.col("sum_weighted") / F.col("covered_us"), 6),
        )
    )
