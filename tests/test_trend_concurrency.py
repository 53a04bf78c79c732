"""OLS trend slope, sweep-line concurrency, diurnal profile."""

import math

import pytest
from pyspark.sql import functions as F

from sac2mseed_spark.operators.concurrency import (
    concurrency_series,
    peak_concurrency,
)
from sac2mseed_spark.operators.profile import hourly_profile
from sac2mseed_spark.operators.trend import trend_slope


def _series(spark, values, conv="c1"):
    rows = [(conv, i * 60_000_000, v) for i, v in enumerate(values)]
    return spark.createDataFrame(
        rows, "conv_id string, window_start_us long, sum_tokens long"
    )


# ------------------------------------------------------------- trend


def test_trend_slope_exact_line(spark):
    # perfectly linear series: slope == the step, for every scored point
    out = trend_slope(_series(spark, [10, 13, 16, 19, 22]), k=4).collect()
    assert len(out) == 2
    assert all(r["slope"] == 3.0 for r in out)


def test_trend_slope_flat_and_reversal(spark):
    flat = trend_slope(_series(spark, [7] * 5), k=4).collect()
    assert all(r["slope"] == 0.0 for r in flat)
    # symmetric V around the frame: net slope 0 over [9,6,3,6,9]? use k=5
    v = trend_slope(_series(spark, [9, 6, 3, 6, 9]), k=5).collect()
    assert len(v) == 1 and v[0]["slope"] == 0.0
    with pytest.raises(ValueError):
        trend_slope(_series(spark, [1, 2]), k=1)


def test_trend_slope_matches_numpy(spark):
    import numpy as np

    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    k = 5
    out = trend_slope(_series(spark, vals), k=k).collect()
    out.sort(key=lambda r: r["window_start_us"])
    for i, r in enumerate(out):
        frame = vals[i : i + k]
        want = np.polyfit(range(k), frame, 1)[0]
        assert math.isclose(r["slope"], want, abs_tol=1e-6)


# ------------------------------------------------------- concurrency


def _segs(spark, spans):
    rows = [(f"c{i}", 0, a, b) for i, (a, b) in enumerate(spans)]
    return spark.createDataFrame(
        rows,
        "conv_id string, segment_id long, seg_start_us long, seg_end_us long",
    )


def test_concurrency_active_counts(spark):
    # overlap: [0,100], [50,150], [200,300] -> peak 2 then 1
    s = _segs(spark, [(0, 100), (50, 150), (200, 300)])
    out = concurrency_series(s).collect()
    by = sorted((r["ts_us"], r["delta"], r["active"]) for r in out)
    assert by == [
        (0, 1, 1),
        (50, 1, 2),
        (100, -1, 1),
        (150, -1, 0),
        (200, 1, 1),
        (300, -1, 0),
    ]


def test_concurrency_boundary_touch_counts_both(spark):
    # one segment ends exactly when the next starts: +1 sorts first
    out = concurrency_series(_segs(spark, [(0, 100), (100, 200)])).collect()
    at100 = sorted(
        (r["delta"], r["active"]) for r in out if r["ts_us"] == 100
    )
    assert at100 == [(-1, 1), (1, 2)]


def test_concurrency_partition_invariance(spark):
    spans = [(i * 10, i * 10 + 55) for i in range(40)]
    a = concurrency_series(_segs(spark, spans), n_parts=2).collect()
    b = concurrency_series(_segs(spark, spans), n_parts=13).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_peak_concurrency_buckets(spark):
    s = _segs(spark, [(0, 100), (50, 150), (200, 300)])
    out = peak_concurrency(concurrency_series(s), bucket_us=200).collect()
    by = {r["window_start_us"]: r["peak_active"] for r in out}
    assert by == {0: 2, 200: 1}
    with pytest.raises(ValueError):
        peak_concurrency(concurrency_series(s), bucket_us=0)


# ----------------------------------------------------------- profile


def test_hourly_profile_buckets_and_averages(spark):
    hour_us = 3_600_000_000
    rows = [
        ("c1", 0 * hour_us + 1, None, 10, "user"),
        ("c1", 0 * hour_us + 2, 1_000_000, 20, "assistant"),
        ("c1", 25 * hour_us, 2_000_000, 30, "user"),  # day 2, hour 1
    ]
    m = spark.createDataFrame(
        rows,
        "conv_id string, ts_us long, latency_us long, token_count long, role string",
    )
    out = {(r["hour"], r["role"]): r for r in hourly_profile(m).collect()}
    assert out[(0, "user")]["n_turns"] == 1
    assert out[(0, "user")]["avg_tokens"] == 10.0
    assert out[(0, "user")]["avg_latency_s"] is None
    assert out[(0, "assistant")]["avg_latency_s"] == 1.0
    assert out[(1, "user")]["sum_tokens"] == 30
