"""As-of join semantics: backward match, tolerance, ties, left mode."""

from sac2mseed_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", 1000, 10.0),
            (2, "u1", 2000, 20.0),
            (3, "u1", 50, 5.0),  # before any right row
            (4, "u2", 500, 7.0),
            (5, "u3", 900, 9.0),  # u3 has no right rows at all
        ],
        "event_id long, user_id string, ts_us long, value double",
    )
    right = spark.createDataFrame(
        [
            (101, "u1", 100),
            (102, "u1", 1000),  # exact-tie with left id 1
            (103, "u1", 1500),
            (104, "u1", 1500),  # duplicate instant: max event_id wins
            (105, "u2", 400),
        ],
        "event_id long, user_id string, ts_us long",
    )
    return left, right


def _run(spark, how, tol=None):
    left, right = _frames(spark)
    out = asof_join(
        left,
        right,
        key_cols=["user_id"],
        ts_col="ts_us",
        right_payload=["event_id"],
        tolerance_us=tol,
        tiebreak_col="event_id",
        how=how,
    )
    return {r["event_id"]: r for r in out.collect()}

def test_backward_match_and_equal_ts(spark):
    m = _run(spark, "inner")
    # left@1000 matches right@1000 (l.ts >= r.ts includes equality)
    assert m[1]["event_id_r"] == 102 and m[1]["ts_r"] == 1000
    # left@2000 matches the later 1500 instant, tiebroken to max id 104
    assert m[2]["event_id_r"] == 104 and m[2]["ts_r"] == 1500
    # left@50 precedes every right row -> dropped in inner mode
    assert 3 not in m
    assert m[4]["event_id_r"] == 105
    assert 5 not in m  # no right rows for u3


def test_tolerance_inner_drops(spark):
    m = _run(spark, "inner", tol=400)
    # gap 0 and 500: id1 (gap 0) kept, id2 (gap 500) dropped
    assert 1 in m and 2 not in m
    assert m[4]["event_id_r"] == 105  # gap 100 kept


def test_left_mode_keeps_and_nulls(spark):
    m = _run(spark, "left", tol=400)
    assert len(m) == 5
    assert m[2]["event_id_r"] is None and m[2]["ts_r"] is None
    assert m[3]["event_id_r"] is None
    assert m[5]["event_id_r"] is None
    assert m[1]["event_id_r"] == 102


def test_partition_invariance(spark):
    left, right = _frames(spark)
    a = sorted(
        (r["event_id"], r["event_id_r"])
        for r in asof_join(
            left, right, ["user_id"], "ts_us", ["event_id"],
            tiebreak_col="event_id",
        ).collect()
    )
    b = sorted(
        (r["event_id"], r["event_id_r"])
        for r in asof_join(
            left.repartition(7), right.repartition(3),
            ["user_id"], "ts_us", ["event_id"], tiebreak_col="event_id",
        ).collect()
    )
    assert a == b and len(a) == 3
