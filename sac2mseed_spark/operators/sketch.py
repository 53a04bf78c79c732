"""K-minimum-values distinct sketch over tier windows.

The reference's SYNC/coverage listings count distinct sources per span
by exact enumeration (/root/reference/libmseed/traceutils.c:1442-1482 —
fine for thousands of channels). At 10^12 turns "how many distinct
conversations were active this hour" is a cardinality-sketch question:
exact distinct shuffles every (window, conv) pair, while a KMV sketch
keeps only the k smallest hash values per window and estimates
cardinality as (k-1) * 2^60 / h_k (Bar-Yossef et al., "Counting
distinct elements in a data stream", RANDOM 2002).

KMV over HyperLogLog here because KMV is *exactly* reproducible in
ANSI SQL: the k-th order statistic of a deterministic md5-derived hash
(functions/hashing.h60 — identical in Spark and DuckDB) plus one
rational estimate, no leading-zero/log tricks whose float boundaries
could differ between engines. Both engines compute the identical
integers and the identical single IEEE division.

Scale shape: one shuffle to distinct (window, key) — map-side partial
distinct applies — then a per-window top-k. The sketch property (the
k-minima of a union are the k-minima of the per-part k-minima) means a
production run can pre-reduce each partition to k rows before the
window shuffle; at k=64 the final per-window state is 64 longs, i.e.
the merge traffic is constant per window regardless of corpus size.
The exact count is carried alongside for small-SF verification; a
100 TB run would drop it (it is the expensive half).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import HASH_BITS, h60

KMV_K = 64
_HASH_SPACE = float(2**HASH_BITS)


def kmv_distinct(
    df: DataFrame,
    key_col: str = "conv_id",
    window_us: int = 3_600_000_000,
    ts_col: str = "ts_us",
    k: int = KMV_K,
) -> DataFrame:
    """Per-window exact and KMV-estimated distinct ``key_col`` count.

    Returns (window_start_us, n_exact, kth_hash, n_kmv_est). When a
    window holds fewer than k distinct keys the sketch is exact by
    definition (kth_hash is NULL, estimate = exact count).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    win = (
        F.floor(F.col(ts_col).cast("long") / F.lit(float(window_us)))
        .cast("long")
        * F.lit(window_us)
    ).alias("window_start_us")
    d = df.select(win, F.col(key_col).alias("__k")).distinct()
    h = d.select("window_start_us", h60(F.col("__k")).alias("h"), "__k")
    w = Window.partitionBy("window_start_us").orderBy("h", "__k")
    r = h.withColumn("rk", F.row_number().over(w))
    agg = r.groupBy("window_start_us").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("kth_hash"),
    )
    est = F.when(
        F.col("kth_hash").isNull(), F.col("n_exact").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("kth_hash").cast("double")
    )
    return agg.select(
        "window_start_us",
        "n_exact",
        "kth_hash",
        F.round(est, 4).alias("n_kmv_est"),
    ).orderBy("window_start_us")
