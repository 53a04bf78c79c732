"""Retention-tier rollup: fixed-epoch windows at 1m / 1h / 1d.

The reference packs each trace into fixed-length records
(/root/reference/libmseed/pack.c:314-337 caps samples per record); we bucket
each conversation's turn stream into fixed-epoch windows per tier. Higher
tiers re-aggregate lower tiers (the msrepack pattern, SURVEY.md §3.3) —
1m is computed from raw turns, 1h from 1m, 1d from 1h.

Bit-exactness contract: every additive statistic is kept in the INTEGER
domain (counts, sums of microseconds, sums of token counts), so cascaded
re-aggregation is exactly associative and the 1h/1d tiers are bit-identical
whether computed from raw turns or from the 1m tier (asserted by tests).
Ratios (avg latency, turn rate) are derived at read time by a single float64
division — the same division in every path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import TIERS

# Aggregate column set of a tier table (pre-payload; operators/pack.py adds
# the compressed series columns).
TIER_AGG_COLS = [
    "n_points",
    "n_latency",
    "sum_latency_us",
    "min_latency_us",
    "max_latency_us",
    "sum_tokens",
    "min_ts_us",
    "max_ts_us",
]


def window_start_col(ts_us_col, tier: str):
    """Epoch-aligned window start in microseconds: floor(ts / w) * w."""
    w = TIERS[tier]
    return (F.floor(ts_us_col / w) * w).cast("long")


def rollup_from_turns(metrics: DataFrame, tier: str) -> DataFrame:
    """Aggregate per-turn metrics directly into one tier.

    One hash-aggregate (partial map-side combine + final) on
    (conv_id, window_start) — Catalyst plans the two-phase agg; no window
    functions, no sort.
    """
    return (
        metrics.withColumn("window_start_us", window_start_col(F.col("ts_us"), tier))
        .groupBy("conv_id", "window_start_us")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.count("latency_us").alias("n_latency"),
            F.sum("latency_us").alias("sum_latency_us"),
            F.min("latency_us").alias("min_latency_us"),
            F.max("latency_us").alias("max_latency_us"),
            F.sum("token_count").alias("sum_tokens"),
            F.min("ts_us").alias("min_ts_us"),
            F.max("ts_us").alias("max_ts_us"),
        )
        .withColumn("tier", F.lit(tier))
    )


def rollup_from_tier(lower: DataFrame, tier: str) -> DataFrame:
    """Re-aggregate a lower tier into a higher one (integer-exact)."""
    return (
        lower.withColumn("ws", window_start_col(F.col("window_start_us"), tier))
        .groupBy("conv_id", "ws")
        .agg(
            F.sum("n_points").alias("n_points"),
            F.sum("n_latency").alias("n_latency"),
            F.sum("sum_latency_us").alias("sum_latency_us"),
            F.min("min_latency_us").alias("min_latency_us"),
            F.max("max_latency_us").alias("max_latency_us"),
            F.sum("sum_tokens").alias("sum_tokens"),
            F.min("min_ts_us").alias("min_ts_us"),
            F.max("max_ts_us").alias("max_ts_us"),
        )
        .withColumnRenamed("ws", "window_start_us")
        .withColumn("tier", F.lit(tier))
    )


def rollup_cascade(metrics: DataFrame) -> dict[str, DataFrame]:
    """1m from raw; 1h from 1m; 1d from 1h.

    The 1m result is the only scan of the raw table; callers should persist
    or checkpoint it (plans/pipeline.py does) so the cascade reads each byte
    of input exactly once — at 100 TB the raw table is scanned once and the
    1h/1d tiers aggregate ~1/60 and ~1/1440 of that volume.
    """
    t1m = rollup_from_turns(metrics, "1m")
    t1h = rollup_from_tier(t1m, "1h")
    t1d = rollup_from_tier(t1h, "1d")
    return {"1m": t1m, "1h": t1h, "1d": t1d}


def derived_point_cols(df: DataFrame, tier: str) -> DataFrame:
    """Attach read-time derived metrics (float64, single division each)."""
    secs = TIERS[tier] / 1_000_000.0
    return df.select(
        "*",
        (F.col("n_points") / F.lit(secs)).alias("turn_rate"),
        F.when(
            F.col("n_latency") > 0, F.col("sum_latency_us") / F.col("n_latency")
        ).alias("avg_latency_us"),
        F.timestamp_micros(F.col("window_start_us")).alias("window_start"),
    )


def rollup_calendar(metrics: DataFrame, unit: str = "month") -> DataFrame:
    """Calendar-aligned rollup tier (week / month / quarter / year).

    Fixed-width epoch windows (the 1m/1h/1d tiers above) cannot express
    calendar retention policies ("keep monthly aggregates for 7 years") —
    months are not a fixed number of microseconds. This tier buckets on
    ``date_trunc`` of the turn timestamp instead of floor-division; the
    session timezone is pinned UTC, so the truncation is deterministic
    and identical in any engine. Same integer-domain statistics as the
    fixed tiers, so cascading/retention logic composes unchanged.

    One hash aggregate on (conv_id, window_start_us) — identical scale
    shape to rollup_from_turns.
    """
    units = {"week", "month", "quarter", "year"}
    if unit not in units:
        raise ValueError(f"unit must be one of {sorted(units)}, got {unit!r}")
    ws = F.unix_micros(
        F.date_trunc(unit, F.timestamp_micros(F.col("ts_us")))
    ).alias("window_start_us")
    return (
        metrics.select("*", ws)
        .groupBy("conv_id", "window_start_us")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.count("latency_us").alias("n_latency"),
            F.sum("latency_us").alias("sum_latency_us"),
            F.min("latency_us").alias("min_latency_us"),
            F.max("latency_us").alias("max_latency_us"),
            F.sum("token_count").alias("sum_tokens"),
            F.min("ts_us").alias("min_ts_us"),
            F.max("ts_us").alias("max_ts_us"),
        )
        .withColumn("tier", F.lit(unit))
    )
