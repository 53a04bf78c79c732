"""Sweep-line concurrency: how many conversations are active at once.

The reference's SYNC coverage listing enumerates each trace's covered
spans (/root/reference/src/sac2mseed.c SYNC output); the cross-trace
question an operator of a transcript fleet asks is the OVERLAP of those
spans — peak concurrent conversations, the capacity-planning number.

Interval overlap is a classic sweep-line: each segment contributes a
+1 event at its start and a -1 event at its end; the running sum over
the global time order is the active count. The running sum over a
TOTAL order is the primitive DataFrame windows don't scale (one
partition holds everything), so this reuses the two-pass distributed
prefix-sum pattern from operators/shards.py: range-repartition by the
order key, per-partition subtotals to the driver (one tiny row each),
broadcast base offsets back, bounded within-partition window.

Boundary semantics: events order by (ts, delta DESC) — a +1 at the same
microsecond as a -1 counts both conversations active at that instant
(closed intervals), deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def concurrency_series(
    segs: DataFrame,
    start_col: str = "seg_start_us",
    end_col: str = "seg_end_us",
    n_parts: int | None = None,
) -> DataFrame:
    """Active-segment count after each boundary event.

    Returns (ts_us, delta, active) — one row per boundary event in
    global time order; ``active`` is the count AFTER applying the event.
    """
    ev = segs.select(
        F.col(start_col).cast("long").alias("ts_us"), F.lit(1).alias("delta")
    ).unionByName(
        segs.select(
            F.col(end_col).cast("long").alias("ts_us"), F.lit(-1).alias("delta")
        )
    )
    if n_parts is None:
        n_parts = max(ev.sparkSession.sparkContext.defaultParallelism, 2)
    # order key: (ts, -delta) so +1 sorts before -1 at equal ts
    part = (
        ev.withColumn("ord", -F.col("delta"))
        .repartitionByRange(n_parts, "ts_us", "ord")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    subtotals = part.groupBy("pid").agg(F.sum("delta").alias("sub")).collect()
    running = 0
    bases = []
    for r in sorted(subtotals, key=lambda r: r["pid"]):
        bases.append((r["pid"], running))
        running += r["sub"]
    base_df = ev.sparkSession.createDataFrame(bases, "pid int, base long")
    w = (
        Window.partitionBy("pid")
        .orderBy("ts_us", "ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        part.join(F.broadcast(base_df), "pid")
        .select(
            "ts_us",
            "delta",
            (F.col("base") + F.sum("delta").over(w)).cast("long").alias("active"),
        )
    )


def peak_concurrency(
    series: DataFrame, bucket_us: int = 3_600_000_000
) -> DataFrame:
    """Max active count per fixed window over a concurrency series."""
    if bucket_us <= 0:
        raise ValueError(f"bucket_us must be positive, got {bucket_us}")
    b = (F.floor(F.col("ts_us") / bucket_us) * bucket_us).cast("long")
    return (
        series.groupBy(b.alias("window_start_us"))
        .agg(F.max("active").alias("peak_active"))
    )
