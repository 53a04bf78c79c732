"""Per-user-turn response latency (time to next assistant turn).

The engine's latency_us metric is inter-TURN spacing; what a serving
dashboard actually reports is time-to-response: for each USER turn,
the gap to the next ASSISTANT turn in the same conversation (tool
turns in between are part of the wait). One reversed window frame
computes it — no self-join, no explode.

Float-determinism design: the per-turn response gap is an exact int64
difference; the per-conversation aggregate sums n, Σgap as integers
and derives the mean by one canonical float division (operators/
anomaly.py discipline). max is integer, exact everywhere.

Scale shape: one shuffle by conv; the next-assistant-ts lookup is a
min over a FOLLOWING rows frame of a conditional column on that same
exchange, and the per-conv aggregate reuses the partitioning. Spark
evaluates the unbounded-following min frame in a single reversed pass
per partition — linear, not quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def response_latency(
    metrics: DataFrame,
    key_col: str = "conv_id",
) -> DataFrame:
    """Per-conversation response-latency profile.

    Expects per-turn metrics rows (conv_id, turn_idx, role, ts_us).
    Returns (conv_id, n_user_turns, n_answered, mean_response_s,
    max_response_s): user turns with no later assistant turn count in
    n_user_turns but not n_answered; a conversation with ZERO answered
    user turns has no defined mean and is dropped. Seconds are floored
    from exact µs
    BEFORE aggregation so the integer sums stay small and the mean is
    one float division.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy("turn_idx", "ts_us")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_asst = F.min(
        F.when(F.col("role") == "assistant", F.col("ts_us"))
    ).over(w)
    user = (
        metrics.select(
            key_col, "turn_idx", "role", "ts_us", next_asst.alias("__na")
        )
        .filter(F.col("role") == "user")
        .select(
            key_col,
            F.when(
                F.col("__na").isNotNull(),
                F.floor(
                    (F.col("__na") - F.col("ts_us")) / F.lit(1000000.0)
                ).cast("long"),
            ).alias("__resp_s"),
        )
    )
    agg = user.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_user_turns"),
        F.count("__resp_s").alias("n_answered"),
        F.sum("__resp_s").alias("__sum_s"),
        F.max("__resp_s").alias("max_response_s"),
    )
    return agg.select(
        key_col,
        "n_user_turns",
        "n_answered",
        F.round(
            F.col("__sum_s").cast("double")
            / F.col("n_answered").cast("double"),
            6,
        ).alias("mean_response_s"),
        "max_response_s",
    ).filter(F.col("n_answered") > 0)
