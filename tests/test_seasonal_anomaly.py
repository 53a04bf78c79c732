"""Hour-of-day baseline anomaly: closed-form check.

Engine-vs-oracle parity at sf0.01 is covered by the driver harness
(`seasonal_anomaly`).
"""

import math

import pytest

from sac2mseed_spark.operators.seasonal_anomaly import (
    HOUR_US,
    seasonal_anomalies,
)


def test_seasonal_baseline_flags_spike(spark):
    # hod 0: 29 tens + one 40 -> mean 11, var 29; hod 1: too few obs
    rows = [(f"c{i}", (i * 24) * HOUR_US, 10) for i in range(29)]
    rows.append(("spike", 29 * 24 * HOUR_US, 40))
    rows += [(f"h1_{i}", (i * 24 + 1) * HOUR_US, 99) for i in range(3)]
    tier = spark.createDataFrame(
        rows, "conv_id string, window_start_us long, value long"
    )
    got = seasonal_anomalies(tier, tau=3.0, min_per_hod=24).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["conv_id"], r["hod"], r["value"]) == ("spike", 0, 40)
    assert r["z"] == round((40 - 11.0) / math.sqrt(150.0 - 121.0), 6)
    with pytest.raises(ValueError):
        seasonal_anomalies(tier, min_per_hod=1)
