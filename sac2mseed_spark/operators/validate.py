"""Input sanity filters + error channel (P5 analogue).

The reference refuses inputs failing header sanity checks (nvhdr==6,
npts>0, iftype==ITIME, leven, plausible start year —
/root/reference/src/sac2mseed.c:525-582) by skipping the file with a
diagnostic. The engine upgrades "skip with message" to an explicit
error-channel DataFrame: one pass computes a reason bitmap per row; valid
rows flow on, invalid rows land in a bad-rows table with machine-readable
reasons. Expression-only — the split is two filters over one scan
(Catalyst collapses the shared subtree under columnar reuse / both sides
push their predicates into the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# plausible event-time range: the reference fixes up years <= 200 and
# rejects implausible start times (sac2mseed.c:525-532)
MIN_TS_US = 0  # 1970-01-01
MAX_TS_US = 4_102_444_800_000_000  # 2100-01-01

RULES = {
    "null_conv_id": lambda: F.col("conv_id").isNull() | (F.length("conv_id") == 0),
    "null_ts": lambda: F.col("ts").isNull(),
    "negative_turn_idx": lambda: F.col("turn_idx") < 0,
    "bad_role": lambda: ~F.col("role").isin("user", "assistant", "tool", "system"),
    "ts_out_of_range": lambda: F.col("ts").isNotNull()
    & ~F.unix_micros(F.col("ts").cast("timestamp")).between(MIN_TS_US, MAX_TS_US),
}


def with_validity(transcripts: DataFrame) -> DataFrame:
    """Attach `reasons` (array of failed rule names) and `is_valid`."""
    reasons = F.array_compact(
        F.array(
            *[
                F.when(rule(), F.lit(name)).otherwise(F.lit(None))
                for name, rule in RULES.items()
            ]
        )
    )
    return transcripts.withColumn("reasons", reasons).withColumn(
        "is_valid", F.size("reasons") == 0
    )


def split_valid(transcripts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid rows, error-channel rows with reasons)."""
    v = with_validity(transcripts)
    good = v.filter("is_valid").drop("reasons", "is_valid")
    bad = v.filter(~F.col("is_valid")).drop("is_valid")
    return good, bad


def validation_report(transcripts: DataFrame) -> DataFrame:
    """Counts per failed rule (a row per reason) plus a 'valid' row —
    the engine's version of the reference's per-file skip diagnostics."""
    v = with_validity(transcripts)
    bad = (
        v.select(F.explode("reasons").alias("reason"))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    good = v.filter("is_valid").agg(
        F.lit("valid").alias("reason"), F.count(F.lit(1)).alias("n_rows")
    )
    return bad.unionByName(good)
