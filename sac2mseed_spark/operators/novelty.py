"""Corpus freshness: per-day share of never-before-seen shingles.

The curation question behind every incremental crawl: how much of
today's data is NEW content vs re-observations of what the corpus
already holds? A day whose novelty share collapses is a crawl loop,
not growth — the per-day twin of the cross-source copy question
`mix.source_overlap` answers.

A shingle's first-occurrence day is a min over its distinct
observation days; a day's novelty is the share of its distinct
shingles whose first day is that day. All counts are exact integers;
ONE float division per day, rounded 6dp.

Scale shape: only (60-bit digest, day) pairs shuffle. One
map-side-combining collect_set to per-shingle day sets (set size is
bounded by the corpus' day span, a small dimension — and dedups the
raw explosion before anything wide moves), then explode that tiny
frame and aggregate per day. Two exchanges total; text never leaves
the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60
from ..functions.text import shingles

DAY_US = 86_400_000_000


def shingle_novelty(
    transcripts: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts_us",
    k: int = 3,
) -> DataFrame:
    """Per-day (day_start_us, n_shingles, n_new, novelty_share).

    n_shingles = distinct shingles observed that day; n_new = those
    whose first observation day (corpus-wide) is that day. Day 1 is
    100% novel by construction.
    """
    day = (
        (F.floor(F.col(ts_col) / F.lit(DAY_US)) * F.lit(DAY_US))
        .cast("long")
        .alias("day_start_us")
    )
    days = (
        transcripts.select(
            day, F.explode(shingles(text_col, k)).alias("sh")
        )
        .select("day_start_us", h60("sh").alias("sh_h"))
        .groupBy("sh_h")
        .agg(F.collect_set("day_start_us").alias("days"))
        .select(
            F.array_min("days").alias("first_day"),
            F.explode("days").alias("day_start_us"),
        )
    )
    return (
        days.groupBy("day_start_us")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                (F.col("first_day") == F.col("day_start_us")).cast("long")
            ).alias("n_new"),
        )
        .select(
            "day_start_us",
            "n_shingles",
            "n_new",
            F.round(
                F.col("n_new").cast("double")
                / F.col("n_shingles").cast("double"),
                6,
            ).alias("novelty_share"),
        )
    )
