"""Sliding-window rate and burst detection (time-RANGE frames)."""

import pytest

from sac2mseed_spark.operators.rate import bursts, sliding_rate


def _m(spark, ts_list, conv="c1"):
    rows = [(conv, t) for t in ts_list]
    return spark.createDataFrame(rows, "conv_id string, ts_us long")


def test_sliding_rate_exact_window_edges(spark):
    # window 100µs inclusive: at ts=150, [50,150] holds 100 and 150
    out = sliding_rate(_m(spark, [0, 100, 150, 400]), window_us=100).collect()
    by = {r["ts_us"]: r["n_in_window"] for r in out}
    assert by == {0: 1, 100: 2, 150: 2, 400: 1}
    # rate: n * (60s / window)
    r100 = next(r for r in out if r["ts_us"] == 100)
    assert r100["rate_per_min"] == 2 * (60_000_000.0 / 100)


def test_sliding_rate_duplicate_ts_peers(spark):
    # equal timestamps are RANGE peers: every dup sees the full peer group
    out = sliding_rate(_m(spark, [10, 10, 10]), window_us=5).collect()
    assert [r["n_in_window"] for r in out] == [3, 3, 3]


def test_bursts_threshold_and_isolation(spark):
    a = _m(spark, [0, 10, 20, 30], conv="a")  # 4 turns in 30µs
    b = _m(spark, [0, 1_000_000], conv="b")
    out = bursts(a.unionByName(b), window_us=100, min_events=4).collect()
    assert len(out) == 1
    assert out[0]["conv_id"] == "a" and out[0]["ts_us"] == 30


def test_rate_validation(spark):
    df = _m(spark, [0])
    with pytest.raises(ValueError):
        sliding_rate(df, window_us=0)
    with pytest.raises(ValueError):
        bursts(df, min_events=0)
