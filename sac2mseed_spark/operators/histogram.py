"""Exponential (log2-bucket) latency histograms.

The reference reports min/max/mean per trace (/root/reference/libmseed/
traceutils.c summary stats); fleet latency monitoring needs the
DISTRIBUTION, and at 10^12 turns the storage-bounded answer is a
fixed-bucket histogram. Log2 buckets (Prometheus/HDR style) cover
sub-second to month-long latencies in ~25 buckets.

The bucket index is floor(log2(latency_s)) computed WITHOUT float log
— `length(bin(x)) - 1`, the bit length of the integer second count —
because neither engine guarantees correctly-rounded log2 at power-of-2
boundaries while `bin()` (integer-to-binary string, identical in Spark
and DuckDB) is exact by construction. Bucket bounds are pow(2, k),
exact doubles cast back to long.

Scale shape: one hash aggregate on (role, bucket) — ~100 groups
regardless of input size, map-side partial aggregation does nearly all
the work; no shuffle beyond the tiny final combine. Mergeable across
corpus shards by summing counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latency_histogram(metrics: DataFrame) -> DataFrame:
    """Per (role, log2-bucket) latency histogram over whole seconds.

    Bucket -1 holds sub-second latencies; bucket k >= 0 holds
    [2^k, 2^(k+1)) seconds. Returns (role, bucket, lo_s, hi_s, n,
    min_lat_s, max_lat_s, sum_lat_s).
    """
    lat_s = F.floor(F.col("latency_us") / F.lit(1_000_000.0)).cast("long")
    staged = (
        metrics.filter(F.col("latency_us").isNotNull() & (F.col("latency_us") >= 0))
        .select(F.col("role"), lat_s.alias("lat_s"))
        .withColumn(
            "bucket",
            F.when(F.col("lat_s") == 0, F.lit(-1)).otherwise(
                (F.length(F.bin(F.col("lat_s"))) - F.lit(1)).cast("int")
            ),
        )
    )
    lo = F.when(F.col("bucket") < 0, F.lit(0)).otherwise(
        F.pow(F.lit(2.0), F.col("bucket").cast("double")).cast("long")
    )
    hi = F.pow(F.lit(2.0), (F.col("bucket") + F.lit(1)).cast("double")).cast(
        "long"
    ) - F.lit(1)
    return (
        staged.groupBy("role", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lat_s").alias("min_lat_s"),
            F.max("lat_s").alias("max_lat_s"),
            F.sum("lat_s").alias("sum_lat_s"),
        )
        .select(
            "role",
            "bucket",
            lo.alias("lo_s"),
            hi.alias("hi_s"),
            "n",
            "min_lat_s",
            "max_lat_s",
            "sum_lat_s",
        )
    )
