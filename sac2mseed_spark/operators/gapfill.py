"""Gap-fill on the epoch grid: LOCF + linear interpolation.

The reference only *reports* gaps (traceutils.c:1500-1621) and refuses to
pack across them; the north rule upgrades this to explicit gap-fill so every
tier window between a conversation's first and last point exists. Two
methods:

  * LOCF  — last observation carried forward (``last(ignorenulls)`` running
    window)
  * linear — interpolate between nearest non-null neighbors
    (``last(ignorenulls)`` back + ``first(ignorenulls)`` forward)

All expression-level. The dense grid is built with
``sequence(min_ws, max_ws, step)`` per conversation — an explode whose output
is exactly the tier's own cardinality, so at 100 TB the grid join is the same
scale as the tier table itself, and it stays co-partitioned on conv_id
(the grid derives FROM the tier aggregate, no second scan of raw data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import TIERS


def gap_fill(
    tier_df: DataFrame,
    tier: str,
    value_cols: list[str],
    method: str = "locf",
) -> DataFrame:
    """Densify a tier table onto its epoch grid and fill value columns.

    Output: one row per (conv_id, every window in [min, max]); for observed
    windows the original values; for synthesized windows filled values and
    ``is_filled = true``. Count-like columns are NOT invented — only
    ``value_cols`` are filled; ``n_points`` is 0 on filled rows.
    """
    step = TIERS[tier]

    # Per-conversation grid bounds: single agg, then explode the grid.
    bounds = tier_df.groupBy("conv_id").agg(
        F.min("window_start_us").alias("ws_min"), F.max("window_start_us").alias("ws_max")
    )
    grid = bounds.select(
        "conv_id",
        F.explode(
            F.sequence(F.col("ws_min"), F.col("ws_max"), F.lit(step).cast("long"))
        ).alias("window_start_us"),
    )

    observed = tier_df.withColumn("is_filled", F.lit(False))
    dense = grid.join(
        observed, on=["conv_id", "window_start_us"], how="left"
    ).withColumn("is_filled", F.coalesce("is_filled", F.lit(True)))
    dense = dense.withColumn("n_points", F.coalesce("n_points", F.lit(0)))

    w = Window.partitionBy("conv_id").orderBy("window_start_us")
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    for c in value_cols:
        if method == "locf":
            dense = dense.withColumn(c, F.last(c, ignorenulls=True).over(back))
        elif method == "linear":
            prev_v = F.last(c, ignorenulls=True).over(back)
            prev_t = F.last(
                F.when(F.col(c).isNotNull(), F.col("window_start_us")), ignorenulls=True
            ).over(back)
            next_v = F.first(c, ignorenulls=True).over(fwd)
            next_t = F.first(
                F.when(F.col(c).isNotNull(), F.col("window_start_us")), ignorenulls=True
            ).over(fwd)
            interp = F.when(
                F.col(c).isNotNull(), F.col(c).cast("double")
            ).when(
                prev_v.isNotNull() & next_v.isNotNull() & (next_t != prev_t),
                prev_v.cast("double")
                + (next_v - prev_v).cast("double")
                * (F.col("window_start_us") - prev_t)
                / (next_t - prev_t),
            ).otherwise(F.coalesce(prev_v, next_v).cast("double"))
            dense = dense.withColumn(c, interp)
        else:
            raise ValueError(f"unknown gap-fill method: {method}")
    return dense
