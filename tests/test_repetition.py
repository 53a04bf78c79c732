"""Repetition-loop detection: consecutive same-role token-set Jaccard.

Engine-vs-oracle parity at sf0.01 is covered by the driver harness
(`repetition_loops`); this file pins the closed-form semantics.
"""

from datetime import datetime, timedelta

from sac2mseed_spark.operators.repetition import repetition_loops

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (conv, i, role, text, None, T0 + timedelta(minutes=i))
            for conv, i, role, text in rows
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def test_exact_loop_and_divergence(spark):
    t = _df(
        spark,
        [
            ("a", 0, "assistant", "ERROR timeout retry"),
            ("a", 1, "user", "hi"),
            ("a", 2, "assistant", "ERROR timeout retry"),
            ("a", 3, "assistant", "ERROR timeout retry"),
            ("a", 4, "assistant", "done all good now"),
        ],
    )
    rows = {
        (r["conv_id"], r["role"]): r
        for r in repetition_loops(t, threshold=0.9, min_pairs=1).collect()
    }
    a = rows[("a", "assistant")]
    # pairs: (0,2)=1.0, (2,3)=1.0, (3,4)=0.0
    assert a["n_pairs"] == 3 and a["n_repeats"] == 2
    assert a["repeat_ratio"] == 0.666667
    assert a["max_jaccard"] == 1.0
    assert ("a", "user") not in rows  # single turn -> no pair


def test_empty_turns_count_as_repeats(spark):
    t = _df(spark, [("b", i, "tool", "") for i in range(4)])
    [r] = repetition_loops(t, threshold=0.9, min_pairs=1).collect()
    assert r["n_pairs"] == 3 and r["n_repeats"] == 3
    assert r["repeat_ratio"] == 1.0 and r["max_jaccard"] == 1.0


def test_partial_overlap_and_set_semantics(spark):
    t = _df(
        spark,
        [
            ("c", 0, "assistant", "x y z a"),
            ("c", 1, "assistant", "x y z b"),
            ("c", 2, "assistant", "x x y z b b"),  # dup tokens: set == prev
            ("c", 3, "assistant", "q"),
        ],
    )
    [r] = repetition_loops(t, threshold=0.9, min_pairs=3).collect()
    # jaccards: 3/5=0.6, 1.0 (set semantics), 0/5=0.0
    assert r["n_pairs"] == 3 and r["n_repeats"] == 1
    assert r["repeat_ratio"] == 0.333333 and r["max_jaccard"] == 1.0


def test_min_pairs_filter(spark):
    t = _df(spark, [("d", i, "user", f"w{i}") for i in range(3)])
    assert repetition_loops(t, min_pairs=3).count() == 0
    assert repetition_loops(t, min_pairs=2).count() == 1
