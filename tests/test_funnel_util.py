"""Ordered role funnel and gap-threshold utilization.

Closed-form hand-built inputs; engine-vs-oracle parity at sf0.01 is
covered by the driver harness (`funnel`, `utilization`).
"""

import pytest

from pyspark.sql import functions as F

from sac2mseed_spark.operators.funnel import funnel_steps
from sac2mseed_spark.operators.utilization import utilization

S = 1_000_000  # 1s in µs


def test_funnel_strict_order(spark):
    m = spark.createDataFrame(
        [
            # A completes the whole funnel (tool AFTER first user)
            ("A", "user", 10), ("A", "assistant", 20),
            ("A", "tool", 30), ("A", "assistant", 40),
            # B: only a user turn
            ("B", "user", 10),
            # C: tool BEFORE the first user turn does not count
            ("C", "tool", 5), ("C", "user", 10),
        ],
        "conv_id string, role string, ts_us long",
    )
    got = {r["conv_id"]: r for r in funnel_steps(m).collect()}
    assert (got["A"]["t1_us"], got["A"]["t2_us"], got["A"]["t3_us"]) == (
        10, 30, 40,
    )
    assert got["A"]["steps_completed"] == 3
    assert (got["B"]["steps_completed"], got["B"]["t2_us"]) == (1, None)
    assert (got["C"]["steps_completed"], got["C"]["t2_us"]) == (1, None)
    with pytest.raises(ValueError):
        funnel_steps(m, steps=("user",))


def test_utilization_split(spark):
    m = spark.createDataFrame(
        [
            ("A", None),           # first turn: no gap
            ("A", 5 * S),          # fully active under 10s threshold
            ("A", 25 * S),         # 10s active + 15s idle
            ("B", None),           # single-turn conversation: dropped
        ],
        "conv_id string, latency_us long",
    )
    rows = utilization(m, idle_after_s=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_gaps"], r["active_us"], r["idle_us"]) == (
        2, 15 * S, 15 * S,
    )
    assert r["utilization"] == 0.5
    with pytest.raises(ValueError):
        utilization(m, idle_after_s=0)
