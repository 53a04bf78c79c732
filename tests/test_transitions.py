"""Role-transition matrix: counts, start rows, probability normalization."""

from sac2mseed_spark.operators.transitions import role_transitions


def _m(spark, seq, conv="c1"):
    rows = [(conv, i, i * 1_000_000, r) for i, r in enumerate(seq)]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts long, role string"
    ).selectExpr("conv_id", "turn_idx", "ts AS ts_us", "role", "timestamp_micros(ts) AS ts")


def test_transition_counts_and_probs(spark):
    out = role_transitions(_m(spark, ["user", "assistant", "user", "assistant"])).collect()
    by = {(r["prev_role"], r["role"]): r for r in out}
    assert by[("<start>", "user")]["n"] == 1
    assert by[("user", "assistant")]["n"] == 2
    assert by[("assistant", "user")]["n"] == 1
    # probabilities normalize per prev_role
    assert by[("user", "assistant")]["p"] == 1.0
    assert by[("<start>", "user")]["p"] == 1.0


def test_transitions_per_conv_isolation(spark):
    a = _m(spark, ["user", "tool"], conv="a")
    b = _m(spark, ["tool", "tool"], conv="b")
    out = role_transitions(a.unionByName(b)).collect()
    by = {(r["prev_role"], r["role"]): r["n"] for r in out}
    # conv boundaries never create cross-conv edges
    assert by[("<start>", "user")] == 1 and by[("<start>", "tool")] == 1
    assert by[("user", "tool")] == 1 and by[("tool", "tool")] == 1
    assert ("tool", "user") not in by
