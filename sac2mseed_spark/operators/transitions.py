"""Turn-role transition matrix over conversation streams.

The reference summarizes per-trace record sequences; the conversational
analogue is the role-transition Markov matrix — how often a user turn
is followed by an assistant turn, a tool call by another tool call, and
so on. The matrix is the fingerprint agent-behavior dashboards and
drift monitors watch (a spike in assistant->assistant means retries;
tool->tool means chains).

Shape: one lag() over the stable turn order (the same conv_id shuffle
every rollup uses), then ONE hash aggregate on (prev_role, role); the
per-prev-role totals come from a second tiny aggregate joined back
(broadcast — at most |roles| rows), keeping probability a single float
division of two exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.metrics import turn_window


def role_transitions(metrics: DataFrame) -> DataFrame:
    """(prev_role, role) transition counts and probabilities.

    First turns (no predecessor) appear under prev_role = '<start>'.
    Returns (prev_role, role, n, p) with p = n / sum(n per prev_role)
    rounded 6dp.
    """
    prev = F.lag("role").over(turn_window())
    edges = metrics.select(
        F.coalesce(prev, F.lit("<start>")).alias("prev_role"),
        F.col("role"),
    )
    counts = edges.groupBy("prev_role", "role").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("prev_role").agg(F.sum("n").alias("__tot"))
    return (
        counts.join(F.broadcast(totals), "prev_role")
        .select(
            "prev_role",
            "role",
            "n",
            F.round(F.col("n") / F.col("__tot"), 6).alias("p"),
        )
    )
