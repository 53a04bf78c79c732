"""Response latency (time to next assistant turn) and cohort retention."""

import math

from sac2mseed_spark.operators.cohort import DAY_US, cohort_retention
from sac2mseed_spark.operators.response import response_latency

S = 1_000_000  # µs per second


def _turns(spark, rows):
    # rows: (conv, idx, role, ts_s)
    data = [(c, i, r, t * S) for c, i, r, t in rows]
    return spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, ts_us long"
    )


def test_response_latency_basic_and_tool_wait(spark):
    rows = [
        ("c1", 0, "user", 0),
        ("c1", 1, "tool", 5),       # tool turn is part of the wait
        ("c1", 2, "assistant", 12),
        ("c1", 3, "user", 20),
        ("c1", 4, "assistant", 23),
        ("c1", 5, "user", 30),      # never answered
    ]
    out = response_latency(_turns(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_user_turns"] == 3 and r["n_answered"] == 2
    assert r["max_response_s"] == 12
    assert math.isclose(r["mean_response_s"], (12 + 3) / 2, abs_tol=1e-6)


def test_response_latency_unanswered_conv_dropped(spark):
    rows = [("c1", 0, "user", 0), ("c1", 1, "user", 10)]
    assert response_latency(_turns(spark, rows)).collect() == []


def test_response_latency_assistant_before_user_ignored(spark):
    # assistant BEFORE the user turn must not answer it
    rows = [
        ("c1", 0, "assistant", 0),
        ("c1", 1, "user", 10),
        ("c1", 2, "assistant", 17),
    ]
    out = response_latency(_turns(spark, rows)).collect()
    assert out[0]["n_answered"] == 1 and out[0]["max_response_s"] == 7


def test_cohort_retention_matrix(spark):
    # cohort day0: c1 (active d0, d1, d2), c2 (active d0, d2)
    # cohort day1: c3 (active d1)
    def day(d, off_s=0):
        return d * DAY_US // S + off_s

    rows = []
    for c, days in (("c1", [0, 1, 2]), ("c2", [0, 2]), ("c3", [1])):
        for i, d in enumerate(days):
            rows.append((c, i, "user", day(d, 60)))
    out = {
        (r["cohort_day_us"] // DAY_US, r["age_days"]): r
        for r in cohort_retention(_turns(spark, rows)).collect()
    }
    assert out[(0, 0)]["n_active"] == 2 and out[(0, 0)]["cohort_size"] == 2
    assert out[(0, 0)]["retention_rate"] == 1.0
    assert out[(0, 1)]["n_active"] == 1
    assert math.isclose(out[(0, 1)]["retention_rate"], 0.5, abs_tol=1e-6)
    assert out[(0, 2)]["n_active"] == 2  # c1 and c2 both return day 2
    assert out[(1, 0)]["cohort_size"] == 1
    assert (1, 1) not in out  # c3 never returns
    assert len(out) == 4
