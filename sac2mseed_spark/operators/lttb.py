"""LTTB (Largest-Triangle-Three-Buckets) visualization downsample.

Steinarsson's LTTB (MSc thesis, U. Iceland 2013, public) keeps one
point per time bucket — the one forming the largest triangle with its
neighbor buckets — and is the de-facto standard for line-chart
downsampling, preserving visual shape far better than averaging. The
sibling M4 operator (operators/downsample.py) guarantees pixel-exact
min/max envelopes with 4 points per bucket; LTTB yields 1 point per
bucket with the best shape retention, so a dashboard uses M4 for
filled envelopes and LTTB for the line.

This is the PARALLEL variant: the classic algorithm anchors each
triangle on the point SELECTED in the previous bucket (a sequential
dependency); the standard parallel simplification anchors on the
previous bucket's MEAN point instead, which decouples buckets and is
what every distributed implementation ships. First/last buckets keep
their first/last point exactly like the reference algorithm keeps the
series endpoints.

Float-determinism design: bucket means come from exact integer sums
(Σts, Σv, n per bucket), and the doubled triangle area
|(ax−cx)(by−ay) − (ax−bx)(cy−ay)| is derived through one canonical
expression mirrored in the DuckDB oracle, so the per-bucket argmax —
ordered by (area desc, ts asc) — picks the identical point in both
engines.

Scale shape: one groupBy on (conv, bucket) for the stats, two
self-equi-joins of points against stats at bucket±1 (same shuffle
key — co-partitioned, never a range join), one argmax window per
(conv, bucket). Fan-out is 1: every point appears once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lttb_downsample(
    tier: DataFrame,
    bucket_us: int,
    value_col: str = "sum_tokens",
    key_col: str = "conv_id",
    order_col: str = "window_start_us",
) -> DataFrame:
    """One shape-preserving point per (key, bucket).

    Returns (key, bucket_start_us, ts, value): the bucket's max-area
    point against the neighbor-bucket mean anchors; a key's first
    (resp. last) OBSERVED bucket contributes its earliest (resp.
    latest) point, matching the endpoint-keeping of sequential LTTB.
    """
    if bucket_us <= 0:
        raise ValueError(f"bucket_us must be positive, got {bucket_us}")

    pts = tier.select(
        F.col(key_col),
        F.col(order_col).cast("long").alias("ts"),
        F.col(value_col).cast("long").alias("value"),
    ).withColumn(
        "__b",
        F.floor(F.col("ts") / F.lit(float(bucket_us))).cast("long"),
    )
    stats = pts.groupBy(key_col, "__b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ts").alias("st"),
        F.sum("value").alias("sv"),
    )
    # neighbor-bucket stats via ONE lag/lead window over the (small)
    # stats relation, guarded by bucket adjacency (a key's buckets may
    # have gaps; only the bucket exactly ±1 counts, same as the old
    # ±1-keyed self-joins, which shuffled stats twice and re-shuffled
    # pts through two join stages — guide §2.4)
    ws = Window.partitionBy(key_col).orderBy("__b")
    adj_prev = F.lag("__b").over(ws) == F.col("__b") - 1
    adj_next = F.lead("__b").over(ws) == F.col("__b") + 1
    aug = stats.select(
        F.col(key_col),
        "__b",
        F.when(adj_prev, F.lag("n").over(ws)).alias("pn"),
        F.when(adj_prev, F.lag("st").over(ws)).alias("pst"),
        F.when(adj_prev, F.lag("sv").over(ws)).alias("psv"),
        F.when(adj_next, F.lead("n").over(ws)).alias("nn"),
        F.when(adj_next, F.lead("st").over(ws)).alias("nst"),
        F.when(adj_next, F.lead("sv").over(ws)).alias("nsv"),
    )
    # every pts bucket exists in stats by construction, so the inner
    # join keeps all points
    j = pts.join(aug, [key_col, "__b"])
    # anchor means from exact int sums; area via ONE canonical shape
    ax = F.col("pst").cast("double") / F.col("pn").cast("double")
    ay = F.col("psv").cast("double") / F.col("pn").cast("double")
    cx = F.col("nst").cast("double") / F.col("nn").cast("double")
    cy = F.col("nsv").cast("double") / F.col("nn").cast("double")
    bx = F.col("ts").cast("double")
    by = F.col("value").cast("double")
    area2 = F.abs((ax - cx) * (by - ay) - (ax - bx) * (cy - ay))
    scored = j.select(
        key_col,
        "__b",
        "ts",
        "value",
        F.col("pn").isNull().alias("__first"),
        F.col("nn").isNull().alias("__last"),
        F.when(
            F.col("pn").isNotNull() & F.col("nn").isNotNull(), area2
        ).alias("__area2"),
    )
    # middle buckets: max area (ties -> earliest ts); first bucket:
    # earliest point; last (or only) bucket: latest point. Encoding the
    # three cases in ONE ordering keeps it a single window pass: the
    # first-bucket branch sorts by ts asc, the last-bucket branch by ts
    # desc, the middle by (area desc, ts asc).
    ordering = [
        F.when(F.col("__first") & ~F.col("__last"), F.col("ts"))
        .when(F.col("__last"), -F.col("ts"))
        .otherwise(-F.lit(1))
        .asc(),
        F.col("__area2").desc_nulls_last(),
        F.col("ts").asc(),
    ]
    pick = Window.partitionBy(key_col, "__b").orderBy(*ordering)
    return (
        scored.select(
            key_col,
            "__b",
            "ts",
            "value",
            F.row_number().over(pick).alias("__rk"),
        )
        .filter(F.col("__rk") == 1)
        .select(
            key_col,
            (F.col("__b") * F.lit(bucket_us)).alias("bucket_start_us"),
            "ts",
            "value",
        )
    )
