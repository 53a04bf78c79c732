"""Sliding (hopping) window rollups — overlapping-epoch tier views.

The fixed tiers (operators/rollup.py) bucket each turn into exactly one
window per tier, mirroring the reference's one-record-per-span packing
(/root/reference/libmseed/pack.c:314-337). Dashboards and SLO monitors
additionally want OVERLAPPING windows — "turns in the trailing hour,
re-evaluated every 15 minutes" — which no fixed tier can serve without
re-aggregation at read time.

Spark-first shape: `F.window(ts, width, slide)` is the native hopping
window — Catalyst expands each row into the width/slide windows that
contain it *inside* the aggregate's project step (no join, no explicit
explode in this module), then hash-aggregates with map-side partial
combine exactly like the fixed tiers.  Row fan-out is the constant
width/slide (4 for 1h/15m), so the shuffle grows by that constant and
nothing else — the same plan holds at 10^12 turns.

All emitted statistics stay in the integer domain (counts, microsecond
sums), so results are bit-exact at any parallelism and the DuckDB twin
(__spark_entry__._sliding_sql) reproduces them with a k-in-range(f)
window-index join.

Streaming twin: the identical `F.window(ts, width, slide)` call is
legal under `readStream` + watermark (tests/test_streaming.py covers the
fixed-window variant; the sliding groupBy differs only in the slide
argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_rollup(
    metrics: DataFrame, width_us: int, slide_us: int
) -> DataFrame:
    """Hopping-window rollup of per-turn metrics.

    Returns one row per (conv_id, window_start_us) for every
    slide-aligned window [start, start+width) that contains at least one
    turn; a turn contributes to width/slide consecutive windows.

    width must be a multiple of slide (the windows-per-point fan-out
    must be an integer for the bit-exact oracle replay).
    """
    if width_us % slide_us != 0:
        raise ValueError("width_us must be a multiple of slide_us")
    win = F.window(
        F.timestamp_micros(F.col("ts_us")),
        f"{width_us} microseconds",
        f"{slide_us} microseconds",
    )
    return (
        metrics.groupBy("conv_id", win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.count("latency_us").alias("n_latency"),
            F.sum("latency_us").alias("sum_latency_us"),
            F.max("latency_us").alias("max_latency_us"),
            F.sum("token_count").alias("sum_tokens"),
        )
        .select(
            "conv_id",
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_points",
            "n_latency",
            "sum_latency_us",
            "max_latency_us",
            "sum_tokens",
        )
    )
