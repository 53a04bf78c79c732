"""Daily role-mix drift: each role's share of turns and tokens.

A distribution-shift monitor for the corpus: if the assistant's token
share climbs week over week, generation got chattier (or users got
quieter) — the kind of drift a training-data pipeline wants flagged
before it skews a mixture. Complements role_transitions (which looks
at ORDER within conversations) with composition over TIME.

Shares are ratios of exact int64 sums, one float division each,
rounded 6dp — the usual log-free determinism discipline.

Scale shape: one hash aggregate raw → (day, role) — at most a few
rows per day — then the per-day totals come from a window over that
TINY aggregate (days × roles rows), not from a second pass over the
data. No joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DAY_US = 86_400_000_000


def role_mix_daily(metrics: DataFrame) -> DataFrame:
    """Per-(day, role) turn/token counts and within-day shares.

    Returns (day_start_us, role, n_turns, sum_tokens, turn_share,
    token_share); shares are NULL on a zero denominator (token_share
    of a day with zero tokens).
    """
    day = (
        (F.floor(F.col("ts_us") / F.lit(DAY_US)) * F.lit(DAY_US))
        .cast("long")
        .alias("day_start_us")
    )
    agg = metrics.select(day, "role", "token_count").groupBy(
        "day_start_us", "role"
    ).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("token_count").alias("sum_tokens"),
    )
    d = Window.partitionBy("day_start_us")
    tot_turns = F.sum("n_turns").over(d)
    tot_tokens = F.sum("sum_tokens").over(d)
    share = lambda c, tot: F.when(  # noqa: E731
        tot > 0,
        F.round(c.cast("double") / tot.cast("double"), 6),
    )
    return agg.select(
        "day_start_us",
        "role",
        "n_turns",
        "sum_tokens",
        share(F.col("n_turns"), tot_turns).alias("turn_share"),
        share(F.col("sum_tokens"), tot_tokens).alias("token_share"),
    )
