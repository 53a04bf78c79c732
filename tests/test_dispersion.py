"""Exact quartile dispersion + crest factor: closed-form check.

Engine-vs-oracle parity at sf0.01 is covered by the driver harness
(`dispersion_stats`).
"""

import pytest

from sac2mseed_spark.operators.dispersion import dispersion_stats


def test_dispersion_closed_form(spark):
    tier = spark.createDataFrame(
        [("A", v) for v in (1, 2, 3, 100)] + [("B", 5), ("B", 5)],
        "conv_id string, value long",
    )
    rows = dispersion_stats(tier, min_windows=4).collect()
    assert len(rows) == 1  # B has too few windows
    r = rows[0]
    # sorted 1,2,3,100: q1 at pos 0.75 -> 1.75; q3 at pos 2.25 -> 27.25
    assert (r["q1"], r["q3"], r["iqr"]) == (1.75, 27.25, 25.5)
    assert r["mean"] == 26.5
    assert (r["peak"], r["par"]) == (100, round(100 / 26.5, 6))
    with pytest.raises(ValueError):
        dispersion_stats(tier, min_windows=1)
