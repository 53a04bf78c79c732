"""Exact per-key percentiles over tier series.

The reference's trace summary prints min/max/mean per trace
(/root/reference/src/sac2mseed.c summary report); the percentile
generalization (p50/p95 latency per conversation) is the statistic
every SLO dashboard actually wants. Spark's exact ``percentile``
aggregate (JVM-side, sort-based within the hash aggregate) and
DuckDB's ``quantile_cont`` both define the continuous quantile at rank
p*(n-1) with linear interpolation, so on INTEGER inputs (exact as
doubles) the two engines produce bit-identical results — verified by
the oracle hash gate.

Scale shape: one hash aggregate on the key; the exact percentile holds
each group's values, so this is for bounded-cardinality groups
(windows-per-conversation, bounded by retention). For unbounded groups
the approximate ``percentile_approx`` sketch is the drop-in (mergeable,
bounded memory) — exposed here via ``approx=True`` (no oracle: the
sketch is Spark-specific by design).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_percentiles(
    tier: DataFrame,
    pcts: Sequence[float] = (0.5, 0.95),
    value_col: str = "sum_tokens",
    key_col: str = "conv_id",
    approx: bool = False,
) -> DataFrame:
    """Exact (or sketched) percentiles of ``value_col`` per key.

    Returns (key, n, p{50,95,...}) — one row per key, one column per
    requested percentile, rounded 6dp.
    """
    if not pcts:
        raise ValueError("pcts must be non-empty")
    v = F.col(value_col).cast("long")
    fn = F.percentile_approx if approx else F.percentile
    aggs = [F.count(v).alias("n")]
    for p in pcts:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"percentile {p} outside [0,1]")
        name = f"p{int(round(p * 100)):02d}"
        aggs.append(F.round(fn(v, F.lit(p)).cast("double"), 6).alias(name))
    return tier.groupBy(key_col).agg(*aggs)
