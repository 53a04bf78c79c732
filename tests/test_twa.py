"""Time-weighted average: exact LOCF apportionment (operators/twa.py)."""

from pyspark.sql import functions as F

from sac2mseed_spark.operators.twa import time_weighted_avg

MIN_US = 60_000_000
HOUR_US = 3_600_000_000
TOL_US = 30 * 60 * 1_000_000


def _metrics(spark, rows):
    # rows: (conv_id, turn_idx, ts_us, token_count)
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts_us long, token_count long"
    )


def test_twa_hand_computed_single_window(spark):
    # v=10 holds 10 min, v=40 holds 20 min, last turn holds 0:
    # twa = (10*10 + 40*20) / 30 = 30
    m = _metrics(
        spark,
        [
            ("c", 0, 0, 10),
            ("c", 1, 10 * MIN_US, 40),
            ("c", 2, 30 * MIN_US, 99),
        ],
    )
    out = time_weighted_avg(m, HOUR_US).collect()
    assert len(out) == 1
    r = out[0]
    assert r["window_start_us"] == 0
    assert r["sum_weighted"] == 10 * 10 * MIN_US + 40 * 20 * MIN_US
    assert r["covered_us"] == 30 * MIN_US
    assert r["n_segments"] == 2
    assert r["twa"] == 30.0


def test_twa_split_across_window_boundary(spark):
    # one 20-min hold straddling the hour mark: 5 min in h0, 15 in h1
    m = _metrics(
        spark,
        [("c", 0, 55 * MIN_US, 12), ("c", 1, 75 * MIN_US, 1)],
    )
    out = {r["window_start_us"]: r for r in time_weighted_avg(m, HOUR_US).collect()}
    assert set(out) == {0, HOUR_US}
    assert out[0]["covered_us"] == 5 * MIN_US
    assert out[HOUR_US]["covered_us"] == 15 * MIN_US
    assert out[0]["twa"] == 12.0 and out[HOUR_US]["twa"] == 12.0


def test_twa_gap_tolerance_caps_hold(spark):
    # a 3 h silence: the hold is capped at 30 min (and stays in hour 0),
    # so hours 1-2 get NO rows — off the air, matching the segment model
    m = _metrics(
        spark,
        [("c", 0, 0, 6), ("c", 1, 3 * HOUR_US, 8), ("c", 2, 3 * HOUR_US + MIN_US, 1)],
    )
    out = {r["window_start_us"]: r for r in time_weighted_avg(m, HOUR_US).collect()}
    assert set(out) == {0, 3 * HOUR_US}
    assert out[0]["covered_us"] == TOL_US
    assert out[0]["twa"] == 6.0
    assert out[3 * HOUR_US]["covered_us"] == MIN_US


def test_twa_conservation_and_bounds(spark):
    # fuzz-ish determinism on a small irregular stream: total covered time
    # equals the sum of capped inter-turn gaps, every window's covered_us
    # is <= width, and every twa lies within [min v, max v]
    import random

    rng = random.Random(7)
    rows, ts = [], 0
    for conv in ("a", "b"):
        ts = 0
        for i in range(40):
            ts += rng.randrange(1, 90 * MIN_US)
            rows.append((conv, i, ts, rng.randrange(1, 500)))
    m = _metrics(spark, rows)
    out = time_weighted_avg(m, HOUR_US)
    rowsx = out.collect()
    assert all(r["covered_us"] <= HOUR_US for r in rowsx)
    vmin = min(r[3] for r in rows)
    vmax = max(r[3] for r in rows)
    assert all(vmin <= r["twa"] <= vmax for r in rowsx)
    got = out.agg(F.sum("covered_us")).collect()[0][0]
    want = 0
    by_conv = {}
    for conv, i, t, v in rows:
        by_conv.setdefault(conv, []).append(t)
    for ts_list in by_conv.values():
        ts_list.sort()
        want += sum(
            min(b - a, TOL_US) for a, b in zip(ts_list, ts_list[1:])
        )
    assert got == want
