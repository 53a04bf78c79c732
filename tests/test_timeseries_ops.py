"""M4 downsample, bounded-kernel EWMA, exact percentiles, calendar tiers."""

import math

import pytest
from pyspark.sql import functions as F

from sac2mseed_spark.operators.downsample import m4_downsample
from sac2mseed_spark.operators.percentiles import key_percentiles
from sac2mseed_spark.operators.rollup import rollup_calendar
from sac2mseed_spark.operators.smooth import ewma_smooth


def _series(spark, values, conv="c1", step_us=60_000_000):
    rows = [(conv, i * step_us, v) for i, v in enumerate(values)]
    return spark.createDataFrame(
        rows, "conv_id string, window_start_us long, sum_tokens long"
    )


# ---------------------------------------------------------------- M4


def test_m4_keeps_exactly_four_extrema(spark):
    # 10 points in one bucket: first=ts0, last=ts9, min=3@ts4, max=90@ts7
    vals = [10, 20, 15, 12, 3, 14, 16, 90, 17, 11]
    out = m4_downsample(_series(spark, vals), bucket_us=10 * 60_000_000).collect()
    got = sorted((r["ts"] // 60_000_000, r["value"]) for r in out)
    assert got == [(0, 10), (4, 3), (7, 90), (9, 11)]
    assert all(r["bucket_start_us"] == 0 for r in out)


def test_m4_tie_determinism(spark):
    # all-equal values: min-struct -> earliest, max-struct -> latest; the
    # four roles collapse to two rows (first and last), never "all ties"
    out = m4_downsample(_series(spark, [7, 7, 7, 7, 7]), bucket_us=10**12).collect()
    got = sorted(r["ts"] // 60_000_000 for r in out)
    assert got == [0, 4]


def test_m4_bucket_boundaries_and_validation(spark):
    vals = [1, 2, 3, 4]  # 2-point buckets -> every point is an extremum
    out = m4_downsample(_series(spark, vals), bucket_us=2 * 60_000_000).collect()
    assert len(out) == 4
    assert sorted({r["bucket_start_us"] for r in out}) == [0, 120_000_000]
    with pytest.raises(ValueError):
        m4_downsample(_series(spark, vals), bucket_us=0)


# -------------------------------------------------------------- EWMA


def test_ewma_exact_weighted_mean(spark):
    vals = [4, 8, 16, 32]
    out = ewma_smooth(_series(spark, vals), k=3, alpha=0.5).collect()
    out.sort(key=lambda r: r["window_start_us"])
    # first two rows dropped (need 2 lags); weights 1, .5, .25 over
    # (x_n, x_{n-1}, x_{n-2}) / 1.75
    assert len(out) == 2
    assert math.isclose(out[0]["ewma"], (16 + 8 * 0.5 + 4 * 0.25) / 1.75, abs_tol=1e-6)
    assert math.isclose(out[1]["ewma"], (32 + 16 * 0.5 + 8 * 0.25) / 1.75, abs_tol=1e-6)


def test_ewma_k1_is_identity(spark):
    out = ewma_smooth(_series(spark, [5, 9]), k=1, alpha=0.5).collect()
    assert sorted(r["ewma"] for r in out) == [5.0, 9.0]


def test_ewma_validation(spark):
    df = _series(spark, [1, 2])
    with pytest.raises(ValueError):
        ewma_smooth(df, k=0)
    with pytest.raises(ValueError):
        ewma_smooth(df, alpha=1.0)


# -------------------------------------------------------- percentiles


def test_percentiles_exact_interpolation(spark):
    # values 0..10: p50 = 5, p95 = 9.5 (rank p*(n-1) linear interp)
    out = key_percentiles(_series(spark, list(range(11))), pcts=(0.5, 0.95)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 11 and r["p50"] == 5.0 and r["p95"] == 9.5


def test_percentiles_approx_and_validation(spark):
    df = _series(spark, list(range(100)))
    r = key_percentiles(df, pcts=(0.5,), approx=True).collect()[0]
    assert abs(r["p50"] - 49.5) <= 1.0  # sketch tolerance
    with pytest.raises(ValueError):
        key_percentiles(df, pcts=())
    with pytest.raises(ValueError):
        key_percentiles(df, pcts=(1.5,))


# ----------------------------------------------------- calendar tiers


def test_rollup_calendar_month_boundaries(spark):
    # turns on Jan 31 23:59 and Feb 1 00:01 land in different months
    jan = 1_706_745_540_000_000  # 2024-01-31T23:59:00Z
    feb = 1_706_745_660_000_000  # 2024-02-01T00:01:00Z
    rows = [("c1", jan, None, 3), ("c1", feb, 60_000_000, 5)]
    m = spark.createDataFrame(
        rows, "conv_id string, ts_us long, latency_us long, token_count long"
    )
    out = {r["window_start_us"]: r for r in rollup_calendar(m, "month").collect()}
    jan1 = 1_704_067_200_000_000  # 2024-01-01
    feb1 = 1_706_745_600_000_000  # 2024-02-01
    assert set(out) == {jan1, feb1}
    assert out[jan1]["n_points"] == 1 and out[jan1]["sum_tokens"] == 3
    assert out[feb1]["sum_tokens"] == 5 and out[feb1]["tier"] == "month"
    with pytest.raises(ValueError):
        rollup_calendar(m, "decade")


def test_rollup_calendar_week_matches_manual_trunc(spark):
    ts = 1_704_067_200_000_000  # 2024-01-01 is a Monday
    rows = [("c1", ts + d * 86_400_000_000, None, 1) for d in range(10)]
    m = spark.createDataFrame(
        rows, "conv_id string, ts_us long, latency_us long, token_count long"
    )
    out = rollup_calendar(m, "week").collect()
    by_ws = {r["window_start_us"]: r["n_points"] for r in out}
    wk2 = ts + 7 * 86_400_000_000
    assert by_ws == {ts: 7, wk2: 3}
