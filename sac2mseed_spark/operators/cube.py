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


DAY_US = 86_400_000_000


def latency_rollup_hier(metrics: DataFrame) -> DataFrame:
    """Hierarchical ROLLUP (day -> role) latency drill-down.

    The CUBE below answers the all-combinations dashboard; operational
    drill-downs want the HIERARCHY instead — per-day-per-role, per-day
    subtotal, grand total — which ROLLUP plans as the same single
    Expand + one hash aggregate but over 3 grouping sets instead of 4
    (no role-only set: a role subtotal across days is not in the
    hierarchy). Same engine-neutral gid convention as the cube.

    Returns (day_start_us, role, gid, n_turns, n_latency,
    sum_latency_us, max_latency_us).
    """
    day = (F.floor(F.col("ts_us") / DAY_US) * DAY_US).cast("long")
    return (
        metrics.withColumn("day_start_us", day)
        .rollup("day_start_us", "role")
        .agg(
            (F.grouping("day_start_us") * 2 + F.grouping("role"))
            .cast("int")
            .alias("gid"),
            F.count(F.lit(1)).alias("n_turns"),
            F.count("latency_us").alias("n_latency"),
            F.sum("latency_us").alias("sum_latency_us"),
            F.max("latency_us").alias("max_latency_us"),
        )
    )


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
