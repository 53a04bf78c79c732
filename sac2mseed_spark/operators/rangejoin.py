"""Bucketed interval-overlap join: session segments × incident hours.

The reference intersects record time spans with selection windows one
list at a time (/root/reference/src/sac2mseed.c selection handling and
libmseed/selection.c:120-199 ms_matchselect's time-window test). The
relational generalization is the INTERVAL OVERLAP JOIN — here: which
session segments (operators/sessionize) overlap "incident hours",
hours whose global turn count exceeds 1.5x the observed hourly mean
(a load-shedding / postmortem query: which conversations were active
while the fleet was hot).

Naive `ON a.start <= b.end AND b.start <= a.end` makes Catalyst plan a
broadcast-nested-loop cross product — quadratic at scale. Because one
side is hour-ALIGNED buckets, the scalable plan is interval bucketing:
explode each segment into the hour buckets it covers (bounded fan-out:
span/1h rows) and equi-join on the hour — hash join, shuffle only on
the hour key; the incident side (one row per hot hour) is tiny and
AQE-broadcast. This is the same explode-to-equi-join strategy the
shards/concurrency operators use for their range problems.

The 1.5x threshold compares an integer count to one engine-identical
float (sum/count in both engines); segments and incidents both derive
from a single scan each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sessionize import DEFAULT_GAP_TOLERANCE_US, segments

HOUR_US = 3_600_000_000
INCIDENT_FACTOR = 1.5


def incident_hours(metrics: DataFrame, factor: float = INCIDENT_FACTOR) -> DataFrame:
    """Hours whose global turn count exceeds ``factor`` x the mean count
    over observed hours. Returns (hour_us, n_turns_hour)."""
    hour = (
        F.floor(F.col("ts_us").cast("long") / F.lit(float(HOUR_US))).cast("long")
        * F.lit(HOUR_US)
    ).alias("hour_us")
    per_hour = metrics.select(hour).groupBy("hour_us").agg(
        F.count(F.lit(1)).alias("n_turns_hour")
    )
    # global-mean threshold as an empty-frame window, NOT a 1-row
    # crossJoin (which Catalyst plans as BroadcastNestedLoopJoin — the
    # plan gate forbids NLJ shapes outright). The single-partition
    # exchange this costs is over the per-HOUR table: one row per hour
    # of fleet history (~9k/year), negligible at any data scale.
    w = Window.partitionBy()
    t = (
        F.sum("n_turns_hour").over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double")
        * F.lit(float(factor))
    )
    return (
        per_hour.withColumn("__t", t)
        .filter(F.col("n_turns_hour").cast("double") > F.col("__t"))
        .select("hour_us", "n_turns_hour")
    )


def interval_overlap(
    metrics: DataFrame,
    factor: float = INCIDENT_FACTOR,
    gap_tolerance_us: int = DEFAULT_GAP_TOLERANCE_US,
) -> DataFrame:
    """Segments that overlap at least one incident hour.

    Returns (conv_id, segment_id, seg_start_us, seg_end_us,
    n_inc_hours, inc_turns) — incident-hour count and the summed
    global turn count of those hours (severity weight).
    """
    seg = segments(metrics, gap_tolerance_us)
    inc = incident_hours(metrics, factor)
    exploded = seg.select(
        "conv_id",
        "segment_id",
        "seg_start_us",
        "seg_end_us",
        F.explode(
            F.sequence(
                F.floor(F.col("seg_start_us") / F.lit(float(HOUR_US))).cast("long"),
                F.floor(F.col("seg_end_us") / F.lit(float(HOUR_US))).cast("long"),
            )
        ).alias("hour_idx"),
    ).withColumn("hour_us", F.col("hour_idx") * F.lit(HOUR_US))
    return (
        exploded.join(inc, "hour_us")
        .groupBy("conv_id", "segment_id", "seg_start_us", "seg_end_us")
        .agg(
            F.count(F.lit(1)).alias("n_inc_hours"),
            F.sum("n_turns_hour").alias("inc_turns"),
        )
    )
