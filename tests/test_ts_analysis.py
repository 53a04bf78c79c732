"""ACF, CUSUM changepoint, seasonal-naive error, SAX words, tool Gini."""

import math

import pytest

from sac2mseed_spark.operators.autocorr import (
    autocorrelation,
    cross_correlation,
)
from sac2mseed_spark.operators.lttb import lttb_downsample
from sac2mseed_spark.operators.changepoint import cusum_changepoints
from sac2mseed_spark.operators.diversity import tool_gini
from sac2mseed_spark.operators.forecast import seasonal_naive_error
from sac2mseed_spark.operators.sax import sax_words

HOUR = 3_600_000_000


def _series(spark, values, conv="c1", step_us=HOUR):
    rows = [(conv, i * step_us, v) for i, v in enumerate(values)]
    return spark.createDataFrame(
        rows, "conv_id string, window_start_us long, sum_tokens long"
    )


def _np_acf(vals, lag):
    x = vals[lag:]
    y = vals[:-lag]
    n = len(x)
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx = sum(a * a for a in x)
    syy = sum(b * b for b in y)
    return (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )


# ------------------------------------------------------------- ACF


def test_acf_alternating_series_is_minus_one(spark):
    vals = [1, 9] * 8
    out = {
        r["lag"]: r
        for r in autocorrelation(
            _series(spark, vals), lags=(1, 2), min_pairs=4
        ).collect()
    }
    # perfect alternation: lag-1 ACF = -1, lag-2 ACF = +1
    assert math.isclose(out[1]["acf"], -1.0, abs_tol=1e-6)
    assert math.isclose(out[2]["acf"], 1.0, abs_tol=1e-6)
    assert out[1]["n_pairs"] == 15 and out[2]["n_pairs"] == 14


def test_acf_matches_definition(spark):
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    out = {
        r["lag"]: r["acf"]
        for r in autocorrelation(
            _series(spark, vals), lags=(1, 3), min_pairs=4
        ).collect()
    }
    for lag in (1, 3):
        assert math.isclose(out[lag], _np_acf(vals, lag), abs_tol=1e-6)


def test_acf_constant_series_dropped_and_validation(spark):
    out = autocorrelation(
        _series(spark, [7] * 20), lags=(1,), min_pairs=4
    ).collect()
    assert out == []  # zero variance on both sides
    with pytest.raises(ValueError):
        autocorrelation(_series(spark, [1, 2]), lags=(0,))
    with pytest.raises(ValueError):
        autocorrelation(_series(spark, [1, 2]), min_pairs=1)


# ------------------------------------------------------------- CCF


def _two_series(spark, xs, ys, conv="c1"):
    rows = [(conv, i * HOUR, x, y) for i, (x, y) in enumerate(zip(xs, ys))]
    return spark.createDataFrame(
        rows, "conv_id string, window_start_us long, lat long, cnt long"
    )


def test_ccf_lag_detects_shifted_copy(spark):
    # x is y shifted right by 2: corr(x_t, y_{t-2}) = 1 exactly
    ys = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7]
    xs = [0, 0] + ys[:-2]
    df = _two_series(spark, xs, ys)
    out = {
        r["lag"]: r["ccf"]
        for r in cross_correlation(
            df, "lat", "cnt", lags=(0, 1, 2), min_pairs=4
        ).collect()
    }
    assert math.isclose(out[2], 1.0, abs_tol=1e-6)
    assert abs(out[0]) < 0.999 and abs(out[1]) < 0.999


def test_ccf_lag_zero_is_pearson(spark):
    xs = [1, 2, 3, 4, 5, 6]
    ys = [2, 4, 6, 8, 10, 12]
    out = cross_correlation(
        _two_series(spark, xs, ys), "lat", "cnt", lags=(0,), min_pairs=4
    ).collect()
    assert len(out) == 1 and math.isclose(out[0]["ccf"], 1.0, abs_tol=1e-6)
    with pytest.raises(ValueError):
        cross_correlation(_two_series(spark, xs, ys), "lat", "cnt", lags=(-1,))


# ------------------------------------------------------------ LTTB


def test_lttb_one_point_per_bucket_keeps_spike(spark):
    # 3 buckets x 4 points; middle bucket has a spike the mean would hide
    vals = [10, 10, 10, 10, 10, 90, 10, 10, 10, 10, 10, 10]
    out = lttb_downsample(
        _series(spark, vals), bucket_us=4 * HOUR, value_col="sum_tokens"
    ).collect()
    assert len(out) == 3  # one point per bucket
    mid = [r for r in out if r["bucket_start_us"] == 4 * HOUR * 1][0]
    assert mid["value"] == 90  # the spike survives
    first = [r for r in out if r["bucket_start_us"] == 0][0]
    last = [r for r in out if r["bucket_start_us"] == 8 * HOUR][0]
    assert first["ts"] == 0  # endpoint keeping
    assert last["ts"] == 11 * HOUR


def test_lttb_single_bucket_and_validation(spark):
    out = lttb_downsample(
        _series(spark, [5, 6, 7]), bucket_us=10**15
    ).collect()
    # only bucket -> latest point (endpoint rule)
    assert len(out) == 1 and out[0]["ts"] == 2 * HOUR
    with pytest.raises(ValueError):
        lttb_downsample(_series(spark, [1]), bucket_us=0)


def test_lttb_prefers_max_area_point(spark):
    # prev mean (ts=0..3 h, v=10), next mean (8..11 h, v=10); middle
    # bucket: 50 beats 40 on area
    vals = [10, 10, 10, 10, 40, 50, 10, 10, 10, 10, 10, 10]
    out = lttb_downsample(_series(spark, vals), bucket_us=4 * HOUR).collect()
    mid = [r for r in out if r["bucket_start_us"] == 4 * HOUR][0]
    assert mid["value"] == 50


# ----------------------------------------------------------- CUSUM


def test_cusum_finds_level_shift(spark):
    vals = [10] * 10 + [50] * 10
    out = cusum_changepoints(_series(spark, vals), tau=1.0).collect()
    assert len(out) == 1
    r = out[0]
    # argmax |D| lands exactly on the last low-level window (index 9)
    assert r["cp_window_start_us"] == 9 * HOUR
    assert r["n_windows"] == 20
    assert math.isclose(r["level_before"], 10.0, abs_tol=1e-6)
    assert math.isclose(r["level_after"], 50.0, abs_tol=1e-6)
    # exact stat: D_9 = 100-9*30... cum at i=10 is 100, D = 100-10*30 = -200
    # sigma = 20, stat = 200/(20*sqrt(20))
    assert math.isclose(
        r["cusum_stat"], 200.0 / (20.0 * math.sqrt(20.0)), abs_tol=1e-6
    )


def test_cusum_stationary_series_not_flagged(spark):
    vals = [10, 11, 9, 10, 12, 8, 10, 11, 9, 10, 12, 8]
    out = cusum_changepoints(_series(spark, vals), tau=1.5).collect()
    assert out == []


def test_cusum_validation_and_min_windows(spark):
    out = cusum_changepoints(
        _series(spark, [1, 100, 1, 100]), tau=0.0, min_windows=8
    ).collect()
    assert out == []  # too few windows
    with pytest.raises(ValueError):
        cusum_changepoints(_series(spark, [1]), min_windows=2)


# -------------------------------------------------- seasonal naive


def test_seasonal_naive_perfect_repeat_zero_error(spark):
    day = [5, 8, 2, 9] * 6  # 24 hourly values
    out = seasonal_naive_error(_series(spark, day * 3), min_pairs=4).collect()
    assert len(out) == 1
    assert out[0]["n_pairs"] == 48
    assert out[0]["mae"] == 0.0 and out[0]["rmse"] == 0.0


def test_seasonal_naive_known_errors_and_gaps(spark):
    # day 1: 10s; day 2: 10+e with e = +3/-4 alternating; one missing
    # window on day 2 contributes no pair
    rows = [("c1", i * HOUR, 10) for i in range(24)]
    errs = [3 if i % 2 == 0 else -4 for i in range(24)]
    rows += [
        ("c1", (24 + i) * HOUR, 10 + errs[i]) for i in range(24) if i != 5
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start_us long, sum_tokens long"
    )
    out = seasonal_naive_error(df, min_pairs=4).collect()
    assert len(out) == 1
    kept = [e for i, e in enumerate(errs) if i != 5]
    n = len(kept)
    assert out[0]["n_pairs"] == n
    assert math.isclose(
        out[0]["mae"], sum(abs(e) for e in kept) / n, abs_tol=1e-6
    )
    assert math.isclose(
        out[0]["rmse"],
        math.sqrt(sum(e * e for e in kept) / n),
        abs_tol=1e-6,
    )
    with pytest.raises(ValueError):
        seasonal_naive_error(df, season_us=0)


# ------------------------------------------------------------- SAX


def test_sax_symbols_quartile_mapping(spark):
    # symmetric series: z-scores ±1.34, ±0.45 -> symbols a/d and b/c
    vals = [10, 30, 20, 40]  # mean 25, std sqrt(125)=11.18
    out = sax_words(_series(spark, vals), min_windows=4).collect()
    assert len(out) == 1
    # z = (-1.34, 0.447, -0.447, 1.34) -> a, c, b, d
    assert out[0]["sax_word"] == "acbd"
    assert out[0]["n_windows"] == 4


def test_sax_word_order_is_window_order(spark):
    # descending ramp: word must be monotone non-increasing symbols
    vals = [40, 30, 20, 10]
    out = sax_words(_series(spark, vals), min_windows=4).collect()
    assert out[0]["sax_word"] == "dcba"


def test_sax_constant_and_short_series_dropped(spark):
    assert sax_words(_series(spark, [5] * 10)).collect() == []
    assert sax_words(_series(spark, [1, 2, 3]), min_windows=4).collect() == []
    with pytest.raises(ValueError):
        sax_words(_series(spark, [1, 2]), min_windows=1)


# ------------------------------------------------------------ Gini


def _turns(spark, tools, conv="c1"):
    rows = [(conv, i, "assistant", "t", tool) for i, tool in enumerate(tools)]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )


def test_gini_single_tool_zero(spark):
    out = tool_gini(_turns(spark, ["bash"] * 6)).collect()
    assert len(out) == 1
    assert out[0]["gini"] == 0.0 and out[0]["n_tools"] == 1


def test_gini_uniform_mix_and_null_bucket(spark):
    # 2 bash, 2 grep, 2 NULL -> three buckets of 2: gini = 1 - 3*(1/9)
    out = tool_gini(_turns(spark, ["bash", "grep", None, "bash", "grep", ""])).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_turns"] == 6 and r["n_tools"] == 3
    assert math.isclose(r["gini"], 1 - 3 * (2 / 6) ** 2, abs_tol=1e-6)
    with pytest.raises(ValueError):
        tool_gini(_turns(spark, ["x"]), min_turns=0)
