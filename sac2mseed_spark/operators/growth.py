"""Calendar week-over-week corpus growth.

The capacity-planning view over the whole corpus: total turns and
tokens per ISO-epoch week (fixed 7-day buckets from the Unix epoch,
which began on a Thursday — bucket alignment, not ISO week-date
semantics) and the growth ratio vs the previous week.

All sums are exact int64; growth is ONE float expression rounded 6dp.
A week with no predecessor (the first) or a zero-token predecessor
has NULL growth rather than an invented value.

Scale shape: one global hash aggregate raw → weeks (map-side partials
collapse everything; output rows = corpus age in weeks), then a lag
window over that tiny table. The window's single-partition sort is
over weeks-count rows — never data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WEEK_US = 7 * 86_400_000_000


def weekly_growth(metrics: DataFrame) -> DataFrame:
    """Per-week totals with week-over-week token growth.

    Returns (week_start_us, n_turns, sum_tokens, growth); growth =
    (cur - prev) / prev over sum_tokens, NULL for the first week or a
    zero-token predecessor.
    """
    wk = (
        (F.col("ts_us") / F.lit(WEEK_US)).cast("long") * F.lit(WEEK_US)
    ).alias("week_start_us")
    agg = metrics.select(wk, "token_count").groupBy("week_start_us").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("token_count").alias("sum_tokens"),
    )
    w = Window.orderBy("week_start_us")
    prev = F.lag("sum_tokens").over(w)
    growth = F.when(
        prev > 0,
        F.round(
            (F.col("sum_tokens") - prev).cast("double")
            / prev.cast("double"),
            6,
        ),
    )
    return agg.select(
        "week_start_us", "n_turns", "sum_tokens", growth.alias("growth")
    )
