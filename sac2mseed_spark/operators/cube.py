"""Grouping-sets latency dashboard — CUBE over (role, tool).

One scan answers the whole dashboard family "latency by role, by tool,
by role x tool, and overall": `df.cube(...)` plans a single Expand +
hash aggregate with map-side partial combine, so the four grouping sets
cost one shuffle of partially-combined rows, not four scans. This is the
macro twin of the reference's per-trace summary listing
(/root/reference/sac2mseed.c tracelist summary output) lifted to the
corpus level.

`gid` disambiguates a data NULL (the tool column is NULL on non-tool
turns) from a rollup-total NULL: it is computed as
2*grouping(role) + grouping(tool) on BOTH engines rather than relying
on each engine's native grouping_id bit order.

Integer-domain outputs only; avg is served at read time by the caller
(same single-division rule as the fixed tiers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latency_cube(metrics: DataFrame) -> DataFrame:
    """CUBE (role, tool) of turn counts and latency sums.

    Returns (role, tool, gid, n_turns, n_latency, sum_latency_us,
    max_latency_us) — one row per grouping-set cell.
    """
    return metrics.cube("role", "tool").agg(
        (F.grouping("role") * 2 + F.grouping("tool"))
        .cast("int")
        .alias("gid"),
        F.count(F.lit(1)).alias("n_turns"),
        F.count("latency_us").alias("n_latency"),
        F.sum("latency_us").alias("sum_latency_us"),
        F.max("latency_us").alias("max_latency_us"),
    )
