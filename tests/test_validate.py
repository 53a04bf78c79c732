"""Sanity-filter error channel (P5, sac2mseed.c:525-582 analogue)."""

import datetime

from sac2mseed_spark.operators.validate import split_valid, validation_report


def _df(spark):
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    far = datetime.datetime(2101, 1, 1)
    rows = [
        ("c1", 0, "user", "hi", None, ts),               # valid
        ("c1", 1, "assistant", "yo", None, ts),          # valid
        (None, 0, "user", "x", None, ts),                # null_conv_id
        ("", 0, "user", "x", None, ts),                  # null_conv_id (empty)
        ("c2", -1, "user", "x", None, ts),               # negative_turn_idx
        ("c3", 0, "robot", "x", None, ts),               # bad_role
        ("c4", 0, "user", "x", None, None),              # null_ts
        ("c5", -2, "alien", "x", None, far),             # 3 reasons at once
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def test_split_valid(spark):
    good, bad = split_valid(_df(spark))
    assert good.count() == 2
    assert bad.count() == 6
    multi = {r["conv_id"]: sorted(r["reasons"]) for r in bad.collect() if r["conv_id"] == "c5"}
    assert multi["c5"] == ["bad_role", "negative_turn_idx", "ts_out_of_range"]


def test_validation_report(spark):
    rep = {r["reason"]: r["n_rows"] for r in validation_report(_df(spark)).collect()}
    assert rep == {
        "valid": 2,
        "null_conv_id": 2,
        "negative_turn_idx": 2,
        "bad_role": 2,
        "null_ts": 1,
        "ts_out_of_range": 1,
    }
