"""Tool stall attribution: how long after each tool does the
conversation resume?

For every turn whose PREDECESSOR was a tool turn, that turn's
inter-turn gap measures the tool's stall — aggregate it by tool name
and you get the per-tool latency bill (which tool is why
conversations sit idle). The per-turn gap already exists on the
metrics exchange; attribution only needs the predecessor's role/tool,
two more lag() columns on the SAME conv-partitioned sort — no
self-join, no second shuffle before the tiny per-tool aggregate.

Seconds are floored from exact µs BEFORE the sums (the
operators/anomaly.py overflow discipline); mean is one float
division rounded 6dp; max is integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tool_stall(metrics: DataFrame, min_uses: int = 3) -> DataFrame:
    """Per-tool resume-latency profile.

    Returns (tool, n_stalls, mean_stall_s, max_stall_s) over turns
    following a tool turn with a defined gap, for tools with >=
    min_uses such turns.
    """
    if min_uses < 1:
        raise ValueError(f"min_uses must be >= 1, got {min_uses}")

    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts_us")
    prev_role = F.lag("role").over(w)
    prev_tool = F.lag("tool").over(w)
    stalls = (
        metrics.select(
            "conv_id",
            "turn_idx",
            "ts_us",
            "role",
            "tool",
            F.col("latency_us"),
        )
        .withColumn("__prev_role", prev_role)
        .withColumn("__prev_tool", prev_tool)
        .filter(
            (F.col("__prev_role") == "tool")
            & F.col("__prev_tool").isNotNull()
            & F.col("latency_us").isNotNull()
        )
        .select(
            F.col("__prev_tool").alias("tool"),
            F.floor(F.col("latency_us") / F.lit(1000000.0))
            .cast("long")
            .alias("stall_s"),
        )
    )
    agg = stalls.groupBy("tool").agg(
        F.count(F.lit(1)).alias("n_stalls"),
        F.sum("stall_s").alias("__s"),
        F.max("stall_s").alias("max_stall_s"),
    )
    mean = F.col("__s").cast("double") / F.col("n_stalls").cast("double")
    return agg.filter(F.col("n_stalls") >= min_uses).select(
        "tool",
        "n_stalls",
        F.round(mean, 6).alias("mean_stall_s"),
        "max_stall_s",
    )
