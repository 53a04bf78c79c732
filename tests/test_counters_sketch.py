"""counter_rate (reset-aware), kmv_distinct (KMV sketch), burstiness."""

import pytest

from sac2mseed_spark.operators.burstiness import burstiness
from sac2mseed_spark.operators.counters import counter_rate
from sac2mseed_spark.operators.sketch import kmv_distinct

MIN = 60_000_000


def _m(spark, rows):
    """rows: (conv, turn_idx, ts_us, tokens)."""
    return spark.createDataFrame(
        [(c, i, t, k) for (c, i, t, k) in rows],
        "conv_id string, turn_idx int, ts_us long, token_count long",
    )


def test_counter_rate_reset_at_segment_boundary(spark):
    # two segments split by a > 30min gap; counter resets, increase doesn't
    rows = [
        ("c", 0, 0 * MIN, 10),
        ("c", 1, 1 * MIN, 20),
        ("c", 2, 2 * MIN, 5),
        ("c", 3, 60 * MIN, 7),  # 58min gap -> new segment
        ("c", 4, 61 * MIN, 3),
    ]
    out = {r["turn_idx"]: r for r in counter_rate(_m(spark, rows)).collect()}
    assert set(out) == {1, 2, 3, 4}  # first turn has no predecessor
    assert out[1]["counter"] == 30 and out[1]["increase"] == 20
    assert out[2]["counter"] == 35 and out[2]["increase"] == 5
    # reset: counter dropped 35 -> 7, increase is the new counter value
    assert out[3]["counter"] == 7 and out[3]["increase"] == 7
    assert out[4]["counter"] == 10 and out[4]["increase"] == 3
    # rate: 20 tokens over 1 minute
    assert out[1]["rate_per_min"] == 20.0


def test_counter_rate_zero_dt_null_rate(spark):
    rows = [("c", 0, 100, 1), ("c", 1, 100, 2)]
    out = counter_rate(_m(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["increase"] == 2 and out[0]["rate_per_min"] is None


def test_kmv_exact_when_under_k(spark):
    rows = [(f"c{i}", 0, i, 1) for i in range(10)]
    out = kmv_distinct(_m(spark, rows), k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_exact"] == 10
    assert r["kth_hash"] is None and r["n_kmv_est"] == 10.0


def test_kmv_estimate_formula_and_window_split(spark):
    # 100 distinct convs in hour 0, 5 in hour 1; k=16 engages in hour 0
    rows = [(f"c{i}", 0, 0, 1) for i in range(100)]
    rows += [(f"d{i}", 0, 3_600_000_000, 1) for i in range(5)]
    out = {
        r["window_start_us"]: r
        for r in kmv_distinct(_m(spark, rows), k=16).collect()
    }
    h0, h1 = out[0], out[3_600_000_000]
    assert h1["n_exact"] == 5 and h1["n_kmv_est"] == 5.0
    assert h0["n_exact"] == 100 and h0["kth_hash"] is not None
    est = round(15.0 * float(2**60) / float(h0["kth_hash"]), 4)
    assert h0["n_kmv_est"] == est
    # an order-statistic estimator over 16 minima lands well inside 3x
    assert 30 < h0["n_kmv_est"] < 300


def test_kmv_validation(spark):
    with pytest.raises(ValueError):
        kmv_distinct(_m(spark, [("c", 0, 0, 1)]), k=1)


def test_burstiness_regular_grid_is_zero(spark):
    rows = [("c", i, i * MIN, 1) for i in range(5)]
    out = burstiness(_m(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_turns"] == 5 and r["n_gaps"] == 4
    assert r["sum_gap_s"] == 4 * 60
    assert r["cv2"] == 0.0 and r["fano"] == 0.0


def test_burstiness_bursty_beats_regular(spark):
    # same mean gap, bursty placement: gaps 1s,1s,1s,237s
    bursty = [("b", 0, 0), ("b", 1, MIN // 60), ("b", 2, 2 * MIN // 60),
              ("b", 3, 3 * MIN // 60), ("b", 4, 240 * MIN // 60)]
    regular = [("r", i, i * MIN) for i in range(5)]
    rows = [(c, i, t, 1) for (c, i, t) in bursty + regular]
    out = {r["conv_id"]: r for r in burstiness(_m(spark, rows)).collect()}
    assert out["b"]["cv2"] > 1.0 > out["r"]["cv2"]
    assert out["b"]["fano"] > out["r"]["fano"]


def test_burstiness_single_gap_null_cv2(spark):
    rows = [("c", 0, 0, 1), ("c", 1, MIN, 1)]
    out = burstiness(_m(spark, rows)).collect()
    assert out[0]["cv2"] is None  # needs >= 2 gaps
