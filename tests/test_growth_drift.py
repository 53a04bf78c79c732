"""Week-over-week growth and verbosity drift: closed-form checks.

Engine-vs-oracle parity at sf0.01 is covered by the driver harness
(`weekly_growth`, `verbosity_drift`).
"""

import pytest

from sac2mseed_spark.operators.drift import verbosity_drift
from sac2mseed_spark.operators.growth import WEEK_US, weekly_growth


def test_weekly_growth_ratio_and_null_first(spark):
    m = spark.createDataFrame(
        [("A", 0, 10), ("A", 1, 10), ("B", WEEK_US + 5, 30)],
        "conv_id string, ts_us long, token_count long",
    )
    # schema needs turn_idx? weekly_growth uses ts_us + token_count only
    rows = {
        r["week_start_us"]: r for r in weekly_growth(m).collect()
    }
    w0, w1 = rows[0], rows[WEEK_US]
    assert (w0["n_turns"], w0["sum_tokens"], w0["growth"]) == (2, 20, None)
    assert (w1["sum_tokens"], w1["growth"]) == (30, 0.5)


def test_verbosity_drift_exact_line(spark):
    # y = 3x + 2 exactly -> slope 3, intercept 2
    m = spark.createDataFrame(
        [("A", i, 3 * i + 2) for i in range(10)]
        + [("short", 0, 1), ("short", 1, 2)],
        "conv_id string, turn_idx int, token_count long",
    )
    rows = verbosity_drift(m, min_turns=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["conv_id"], r["n_turns"], r["slope"], r["intercept"]) == (
        "A", 10, 3.0, 2.0,
    )
    with pytest.raises(ValueError):
        verbosity_drift(m, min_turns=1)
