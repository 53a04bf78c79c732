"""Ordered role-sequence funnel per conversation.

Product-analytics funnel over the turn stream: did the conversation
reach role step 1, then step 2 strictly after it, then step 3 after
that (default user → tool → assistant: the user asked, a tool ran,
the assistant answered). Reports the first-completion timestamp of
each reached step, so downstream can derive step conversion and
step-to-step latency distributions.

Each stage k is ``min(ts WHERE role = step_k AND ts > t_{k-1})`` — a
conditional aggregate, not a sequence scan, so there is no per-row
Python and no self-join on the raw stream. "Strictly after" makes the
result deterministic when different-role turns share a timestamp.

Scale shape: one conditional hash aggregate per step plus a join-back,
every one keyed on conv_id — Catalyst keeps the whole chain on a
single hash partitioning, and each join's right side is a per-conv
1-row summary. Cost is O(steps) passes over the conv-partitioned
turns, with steps a small constant.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_STEPS = ("user", "tool", "assistant")


def funnel_steps(
    metrics: DataFrame,
    steps: Sequence[str] = DEFAULT_STEPS,
    role_col: str = "role",
) -> DataFrame:
    """Per-conversation ordered funnel completion.

    Returns (conv_id, t1_us .. tN_us, steps_completed); ``tk_us`` is
    NULL from the first step the conversation never reached (the t
    columns are monotone non-null prefixes by construction).
    """
    if len(steps) < 2:
        raise ValueError(f"need >= 2 steps, got {list(steps)}")

    base = metrics.select(
        "conv_id", F.col(role_col).alias("__role"), F.col("ts_us")
    )
    acc = base.groupBy("conv_id").agg(
        F.min(
            F.when(F.col("__role") == steps[0], F.col("ts_us"))
        ).alias("t1_us")
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}_us"
        acc = (
            base.join(acc, "conv_id")
            .groupBy("conv_id")
            .agg(
                *[F.first(f"t{j}_us").alias(f"t{j}_us") for j in range(1, i)],
                F.min(
                    F.when(
                        (F.col("__role") == step)
                        & (F.col("ts_us") > F.col(prev)),
                        F.col("ts_us"),
                    )
                ).alias(f"t{i}_us"),
            )
        )
    completed = sum(
        F.when(F.col(f"t{i}_us").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    return acc.withColumn(
        "steps_completed", completed.cast("int")
    )
