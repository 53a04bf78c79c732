"""Survival-curve semantics: exact horizon boundaries and monotonicity."""

import pytest
from pyspark.sql import functions as F

from sac2mseed_spark.operators.survival import conv_survival


def _m(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, ts_us long")


def test_boundary_and_monotone(spark):
    # durations: a=0 (single turn), b=exactly 100 (boundary: survives
    # h=100), c=250
    m = _m(
        spark,
        [
            ("a", 1000),
            ("b", 0),
            ("b", 100),
            ("c", 10),
            ("c", 60),
            ("c", 260),
        ],
    )
    out = {
        r["horizon_us"]: r
        for r in conv_survival(m, horizons_us=[50, 100, 200, 300]).collect()
    }
    assert [out[h]["n_surviving"] for h in (50, 100, 200, 300)] == [2, 2, 1, 0]
    assert all(out[h]["n_convs"] == 3 for h in out)
    assert out[100]["survival_frac"] == pytest.approx(2 / 3, abs=1e-6)
    # survival is non-increasing in the horizon
    fr = [out[h]["survival_frac"] for h in sorted(out)]
    assert fr == sorted(fr, reverse=True)


def test_bad_horizons(spark):
    m = _m(spark, [("a", 0)])
    with pytest.raises(ValueError):
        conv_survival(m, horizons_us=[])
    with pytest.raises(ValueError):
        conv_survival(m, horizons_us=[-1, 10])


def test_plan_shape(spark):
    # the horizon fan-out must sit on the conv-level frame: exactly two
    # exchanges (conv agg, horizon agg), no join, no window
    m = _m(spark, [("a", 0), ("a", 5), ("b", 1)])
    plan = conv_survival(m)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2
    assert "Join" not in plan and "Window" not in plan
