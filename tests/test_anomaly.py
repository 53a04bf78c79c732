"""Trailing z-score: spike detection, zero-variance and short-history guards."""

import math

from sac2mseed_spark.operators.anomaly import zscore_anomalies

import pytest


def _tier(spark, values, conv="c1"):
    rows = [(conv, i * 60_000_000, v) for i, v in enumerate(values)]
    return spark.createDataFrame(
        rows, "conv_id string, window_start_us long, sum_tokens long"
    )


def test_spike_flagged_with_exact_stats(spark):
    # 4 trailing windows alternating 8/12 (mean 10, var 4), then a spike
    vals = [8, 12, 8, 12, 30]
    out = zscore_anomalies(_tier(spark, vals), k=4, tau=3.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r["window_start_us"] == 4 * 60_000_000 and r["value"] == 30
    assert r["trail_mean"] == 10.0
    assert r["trail_std"] == 2.0
    assert math.isclose(r["z"], (30 - 10.0) / 2.0, abs_tol=1e-9)


def test_zero_variance_and_short_history_not_scored(spark):
    # constant series: var 0 -> nothing scored even for a wild spike of
    # the FOLLOWING window's trailing block... (spike itself IS scored
    # against the constant block? no: var=0 excluded)
    out = zscore_anomalies(_tier(spark, [5, 5, 5, 5, 99]), k=4, tau=1.0).collect()
    assert out == []
    # fewer than k prior windows: never scored
    out2 = zscore_anomalies(_tier(spark, [1, 9, 1, 99]), k=4, tau=0.1).collect()
    assert out2 == []


def test_per_conv_isolation(spark):
    a = _tier(spark, [8, 12, 8, 12, 30], conv="a")
    b = _tier(spark, [8, 12, 8, 12, 10], conv="b")
    out = zscore_anomalies(a.unionByName(b), k=4, tau=3.0).collect()
    assert [r["conv_id"] for r in out] == ["a"]


def test_bad_k_raises(spark):
    with pytest.raises(ValueError):
        zscore_anomalies(_tier(spark, [1, 2, 3]), k=1)
