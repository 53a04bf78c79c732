"""M4 visualization downsampling: min/max/first/last point per bucket.

The reference's repack path reduces a dense trace to coarser records
(/root/reference/src/sac2mseed.c record re-blocking; libmseed/pack.c
caps samples per record); the visualization analogue every monitoring
UI runs is M4 aggregation (Jugel et al., "M4: A Visualization-Oriented
Time Series Data Aggregation", VLDB 2014): per pixel-column bucket keep
exactly the four points achieving min(value), max(value), min(ts),
max(ts) — the points that make a line rendering pixel-identical to the
full series. Unlike LTTB, M4 is order-independent within the bucket, so
it is exactly expressible as a relational aggregate + equi-join and
replays bit-for-bit in any SQL engine.

Tie determinism: real token/latency series have low-cardinality values,
so "all rows equal to the extremum" degenerates to keeping nearly
everything. The extrema are therefore selected as LEXICOGRAPHIC struct
min/max — min(struct(value, ts)) is the earliest row among the minima,
max(struct(value, ts)) the latest among the maxima (and symmetrically
struct(ts, value) for first/last) — a total order, so exactly <= 4 rows
per bucket survive and the choice is engine-independent (Spark and
DuckDB both order structs lexicographically).

Scale shape: one hash aggregate on (conv, bucket) producing four struct
extrema, then ONE equi-join back on (conv, bucket) with an OR-of-four
row predicate — no window sort, no explode. At 100 TB the aggregate
side is 4 values per conv x bucket, so AQE broadcasts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def m4_downsample(
    series: DataFrame,
    bucket_us: int,
    value_col: str = "sum_tokens",
    key_col: str = "conv_id",
    ts_col: str = "window_start_us",
) -> DataFrame:
    """Keep per (key, bucket) exactly the <= 4 M4 extremum rows.

    Returns (key, ts, value, bucket_start_us) for the deterministic
    min-value / max-value / first / last points of each bucket.
    """
    if bucket_us <= 0:
        raise ValueError(f"bucket_us must be positive, got {bucket_us}")
    b = (F.floor(F.col(ts_col) / bucket_us) * bucket_us).cast("long")
    pts = series.select(
        F.col(key_col),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(value_col).cast("long").alias("value"),
        b.alias("bucket_start_us"),
    )
    vt = F.struct(F.col("value"), F.col("ts"))
    tv = F.struct(F.col("ts"), F.col("value"))
    ext = pts.groupBy(key_col, "bucket_start_us").agg(
        F.min(vt).alias("__vmin"),
        F.max(vt).alias("__vmax"),
        F.min(tv).alias("__tmin"),
        F.max(tv).alias("__tmax"),
    )
    keep = (
        (vt == F.col("__vmin"))
        | (vt == F.col("__vmax"))
        | (tv == F.col("__tmin"))
        | (tv == F.col("__tmax"))
    )
    return (
        pts.join(ext, on=[key_col, "bucket_start_us"], how="inner")
        .filter(keep)
        .select(key_col, "ts", "value", "bucket_start_us")
    )
