"""Data-layout clustering audit: z-order vs time-sorted files.

Answers, with numbers, the question every 100 TB table owner has to
settle before the first big write: HOW should the tier files be
sorted? The audit lays the same point stream out both ways — pure
time order (the naive append layout) and z-order over (conv bucket,
hour bucket) — cuts each order into equal-row files, and reports
per-file clustering stats: how many distinct conversations and hours
each file touches, and how tight its z-key rectangle is. Files that
touch few conversations AND few hours are files parquet footer stats
can skip for either predicate family; the per-layout contrast makes
the trade-off auditable instead of folklore.

All-integer outputs — counts and key spans — so cross-engine parity
is exact with no float discipline needed at all.

Scale shape: the audit itself is a global ntile over the point
stream, i.e. ONE total sort per layout — run it on a tier slice or a
sample, not the full 10^12-turn table (the docstring contract, same
as every layout-advisor tool). The production WRITE path needs no
global sort: `repartitionByRange(zkey)` + `sortWithinPartitions` is
the scale-safe equivalent (range exchange + local sort, no single
point of order), and the z-key itself (functions/zorder.py) is pure
codegen integer math either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.zorder import conv_bucket, hour_bucket, interleave


def layout_audit(
    transcripts_ts_us: DataFrame, n_files: int = 64
) -> DataFrame:
    """Per-(layout, file) clustering stats over (conv_id, turn_idx,
    ts_us) rows.

    Returns (layout, file_id, n_rows, n_convs, n_hours, z_span):
    `zorder` files cluster both dimensions; `time` files cluster hours
    only. Deterministic: ntile runs over a totally-ordered key
    (bucket keys + conv_id + ts_us + turn_idx tiebreak).
    """
    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files}")

    keyed = transcripts_ts_us.select(
        "conv_id",
        "turn_idx",
        "ts_us",
        conv_bucket("conv_id").alias("cb"),
        hour_bucket("ts_us").alias("hb"),
    ).withColumn("zkey", interleave(F.col("cb"), F.col("hb")))

    def files(order_cols, layout: str) -> DataFrame:
        w = Window.orderBy(*order_cols)
        return (
            keyed.withColumn("file_id", F.ntile(n_files).over(w))
            .groupBy("file_id")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("conv_id").alias("n_convs"),
                F.countDistinct("hb").alias("n_hours"),
                (F.max("zkey") - F.min("zkey")).alias("z_span"),
            )
            .select(
                F.lit(layout).alias("layout"),
                "file_id",
                "n_rows",
                "n_convs",
                "n_hours",
                "z_span",
            )
        )

    z = files(["zkey", "conv_id", "ts_us", "turn_idx"], "zorder")
    t = files(["ts_us", "conv_id", "turn_idx"], "time")
    return z.unionByName(t)
