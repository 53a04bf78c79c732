"""Sliding-window turn rate and burst detection over raw turns.

The reference's gap tolerance checks compare each record's spacing to
the nominal rate (/root/reference/libmseed/traceutils.c:300-334 gap
calc); the inverse monitoring question is the INSTANTANEOUS rate — how
many turns landed in the trailing window ending at each turn — and its
alarm form, burst detection (rate >= threshold), the flood/abuse signal
a transcript fleet rate-limits on.

This is a RANGE-frame window (time-based, not row-based): the frame
[ts - window_us, ts] holds however many turns fall in that span, so
irregular grids are handled exactly — no bucketing artifacts at window
edges. Counts are integers; the derived rate is one float division.

Scale shape: one shuffle by conv, one range-frame running window per
conv — no self-join, no explode; range frames over a sorted long column
are a single pass with two moving pointers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sliding_rate(
    metrics: DataFrame,
    window_us: int = 3_600_000_000,
    key_col: str = "conv_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Trailing-window turn count and rate at every turn.

    Returns (key, ts, n_in_window, rate_per_min) where n_in_window
    counts turns in [ts - window_us, ts] inclusive.
    """
    if window_us <= 0:
        raise ValueError(f"window_us must be positive, got {window_us}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).cast("long"))
        .rangeBetween(-window_us, 0)
    )
    per_min = 60_000_000.0 / float(window_us)
    return metrics.select(
        F.col(key_col),
        F.col(ts_col).cast("long").alias("ts_us"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    ).select(
        key_col,
        "ts_us",
        "n_in_window",
        F.round(F.col("n_in_window") * F.lit(per_min), 6).alias("rate_per_min"),
    )


def bursts(
    metrics: DataFrame,
    window_us: int = 3_600_000_000,
    min_events: int = 10,
    key_col: str = "conv_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Turns whose trailing-window count reaches ``min_events``."""
    if min_events < 1:
        raise ValueError(f"min_events must be >= 1, got {min_events}")
    r = sliding_rate(metrics, window_us, key_col=key_col, ts_col=ts_col)
    return r.filter(F.col("n_in_window") >= min_events)
