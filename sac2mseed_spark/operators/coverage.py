"""Per-day tier coverage audit — the SYNC listing, completeness-first.

The reference's SYNC output enumerates the time spans a channel actually
covers (sac2mseed's -S listing; /root/reference/sac2mseed.c SYNC mode);
`operators/sessionize.py` reproduces those spans. Operators teams ask
the inverse question at the calendar grain: "for each conversation-day,
how COMPLETE is the 1h tier?" — the query that catches silent ingest
holes before they age into the retention horizon.

Shape: re-aggregates the (already one-shuffle) 1h rollup by
(conv, day). The second exchange moves only tier rows (~1/cadence of
the raw turn count), and Catalyst column-prunes the tier body down to
the columns coverage touches — fed from raw metrics, the latency
window (lag + its conv exchange) disappears entirely and the scan
reads just (ts, user_id) (asserted by tests/test_plans.py). No
calendar dimension table, no join: hour slots are counted with a
distinct-free `count(*)` because tier rows are unique per
(conv, window) by construction.

`coverage` is the single derived float (one division, 6 dp) per the
engine-wide float rule; everything else is integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAY_US = 86_400_000_000
HOURS_PER_DAY = 24


def daily_coverage(tier_1h: DataFrame) -> DataFrame:
    """Per (conv_id, day) completeness of the 1h tier.

    Returns (conv_id, day_start_us, n_hours, coverage, first_window_us,
    last_window_us, n_points): how many of the day's 24 hour-slots hold
    data, the fraction, the first/last populated slot, and the day's
    total point count.
    """
    return (
        tier_1h.withColumn(
            "day_start_us",
            (F.floor(F.col("window_start_us") / DAY_US) * DAY_US).cast(
                "long"
            ),
        )
        .groupBy("conv_id", "day_start_us")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.round(F.count(F.lit(1)) / F.lit(HOURS_PER_DAY), 6).alias(
                "coverage"
            ),
            F.min("window_start_us").alias("first_window_us"),
            F.max("window_start_us").alias("last_window_us"),
            F.sum("n_points").alias("n_points"),
        )
    )
