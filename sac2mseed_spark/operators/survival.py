"""Conversation-duration survival curve at fixed horizons.

"What fraction of conversations are still alive after 1 minute / 15
minutes / a day?" is the product-analytics dual of the retention tiers:
tiers ask what a conversation did inside each window, the survival
curve asks how long conversations last at all. Reference analogue: the
per-trace end-time/duration bookkeeping every accepted trace carries
(`/root/reference/libmseed/traceutils.c:461-508` extends a trace's
endtime as records arrive; duration is its span).

All counting is exact int64; the survival fraction is ONE float
division rounded 6dp per horizon. Conversations with a single turn
have duration 0 and survive only the 0-horizon if one is configured.

Scale shape: one conv-keyed hash aggregate collapses the corpus to one
(conv, duration) row per conversation — map-side partials do the heavy
lifting, nothing else ever sees turn-level data. The horizon explode
is a COMPILE-TIME constant fan-out (len(horizons), default 6) applied
to the conv-level frame, and the final aggregate has len(horizons)
groups. No window functions, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# default horizons: 1m, 5m, 15m, 1h, 6h, 1d (microseconds)
DEFAULT_HORIZONS_US = (
    60_000_000,
    300_000_000,
    900_000_000,
    3_600_000_000,
    21_600_000_000,
    86_400_000_000,
)


def conv_survival(
    metrics: DataFrame, horizons_us=DEFAULT_HORIZONS_US
) -> DataFrame:
    """Fraction of conversations lasting at least each horizon.

    Input needs (conv_id, ts_us). Returns one row per horizon:
    (horizon_us, n_convs, n_surviving, survival_frac) where duration is
    max(ts_us) - min(ts_us) per conversation and survival_frac =
    round(n_surviving / n_convs, 6).
    """
    hs = sorted(int(h) for h in horizons_us)
    if not hs:
        raise ValueError("horizons_us must be non-empty")
    if hs[0] < 0:
        raise ValueError(f"horizons must be >= 0, got {hs[0]}")
    durs = metrics.groupBy("conv_id").agg(
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us")
    )
    exploded = durs.select(
        F.explode(F.array(*[F.lit(h) for h in hs])).alias("horizon_us"),
        "duration_us",
    )
    return (
        exploded.groupBy("horizon_us")
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum(
                (F.col("duration_us") >= F.col("horizon_us")).cast("long")
            ).alias("n_surviving"),
        )
        .select(
            "horizon_us",
            "n_convs",
            "n_surviving",
            F.round(
                F.col("n_surviving").cast("double")
                / F.col("n_convs").cast("double"),
                6,
            ).alias("survival_frac"),
        )
    )
