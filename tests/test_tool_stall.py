"""Tool stall attribution: closed-form check.

Engine-vs-oracle parity at sf0.01 is covered by the driver harness
(`tool_stall`).
"""

import pytest

from sac2mseed_spark.operators.toolstall import tool_stall

S = 1_000_000


def test_tool_stall_attributes_next_gap(spark):
    rows = []
    # conv A: user -> tool(search) -> assistant 7s later (one stall)
    rows += [
        ("A", 0, 0, "user", None, None),
        ("A", 1, 10 * S, "tool", "search", 10 * S),
        ("A", 2, 17 * S, "assistant", None, 7 * S),
    ]
    # conv B..D: three more 'search' stalls of 1s to pass min_uses,
    # plus one 'checkout' stall (under min_uses, dropped)
    for i, c in enumerate(("B", "C", "D")):
        rows += [
            (c, 0, 0, "tool", "search", None),
            (c, 1, 1 * S, "user", None, 1 * S),
        ]
    rows += [
        ("E", 0, 0, "tool", "checkout", None),
        ("E", 1, 5 * S, "user", None, 5 * S),
    ]
    m = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, ts_us long, role string,"
        " tool string, latency_us long",
    )
    got = {r["tool"]: r for r in tool_stall(m, min_uses=3).collect()}
    assert set(got) == {"search"}
    s = got["search"]
    assert (s["n_stalls"], s["max_stall_s"]) == (4, 7)
    assert s["mean_stall_s"] == round((7 + 1 + 1 + 1) / 4, 6)
    with pytest.raises(ValueError):
        tool_stall(m, min_uses=0)


def test_conv_outcomes_last_word(spark):
    from sac2mseed_spark.operators.outcomes import conv_outcomes

    m = spark.createDataFrame(
        [
            ("A", 0, 0, "user", None, None),
            ("A", 1, 9 * S, "assistant", None, 9 * S),
            ("B", 0, 0, "user", None, None),
            ("B", 1, 4 * S, "tool", "search", 4 * S),
        ],
        "conv_id string, turn_idx int, ts_us long, role string,"
        " tool string, latency_us long",
    )
    got = {r["conv_id"]: r for r in conv_outcomes(m).collect()}
    a, b = got["A"], got["B"]
    assert (a["last_role"], a["ended_answered"], a["duration_us"]) == (
        "assistant", 1, 9 * S,
    )
    assert (b["last_role"], b["ended_answered"], b["n_turns"]) == (
        "tool", 0, 2,
    )
