"""OHLC bars and the salted per-window top-k leaderboard.

Closed-form hand-built inputs; engine-vs-oracle parity at sf0.01 is
covered by the driver harness (`ohlc_1h`, `window_topk`).
"""

import pytest

from sac2mseed_spark.operators.leaderboard import window_topk
from sac2mseed_spark.operators.ohlc import ohlc_bars

H = 3_600_000_000


def test_ohlc_first_last_min_max(spark):
    m = spark.createDataFrame(
        [
            ("A", 0, 10, 5),
            ("A", 1, 20, 9),
            ("A", 2, 30, 3),
            ("A", 3, H + 1, 7),
            ("B", 0, 15, 2),
        ],
        "conv_id string, turn_idx int, ts_us long, token_count long",
    )
    got = {
        (r["conv_id"], r["window_start_us"]): r
        for r in ohlc_bars(m, "1h").collect()
    }
    a0 = got[("A", 0)]
    assert (a0["open"], a0["high"], a0["low"], a0["close"]) == (5, 9, 3, 3)
    assert a0["n_points"] == 3
    a1 = got[("A", H)]
    assert (a1["open"], a1["close"], a1["n_points"]) == (7, 7, 1)
    assert (got[("B", 0)]["open"], got[("B", 0)]["close"]) == (2, 2)


def test_ohlc_same_ts_breaks_by_turn_idx(spark):
    m = spark.createDataFrame(
        [("A", 0, 10, 1), ("A", 1, 10, 2)],
        "conv_id string, turn_idx int, ts_us long, token_count long",
    )
    r = ohlc_bars(m, "1h").collect()[0]
    assert (r["open"], r["close"]) == (1, 2)


def test_window_topk_tie_and_prefilter_equivalence(spark):
    tier = spark.createDataFrame(
        [("c1", 0, 10), ("c2", 0, 10), ("c3", 0, 5), ("c4", 0, 1),
         ("c9", H, 4)],
        "conv_id string, window_start_us long, sum_tokens long",
    )
    want = [(0, 1, "c1", 10), (0, 2, "c2", 10), (H, 1, "c9", 4)]
    for pf in (True, False):
        got = sorted(
            (r["window_start_us"], r["rank"], r["conv_id"], r["value"])
            for r in window_topk(tier, k=2, prefilter=pf).collect()
        )
        assert got == want
    with pytest.raises(ValueError):
        window_topk(tier, k=0)
