"""Gaps-and-islands streaks, median/MAD outliers, tool co-occurrence.

Hand-built inputs with closed-form expected outputs; engine-vs-oracle
parity at sf0.01 is covered by the driver harness (oracle_sql entries
`activity_streaks`, `robust_outliers`, `tool_cooccurrence`).
"""

import pytest

from sac2mseed_spark.operators.cooccur import tool_cooccurrence
from sac2mseed_spark.operators.robust import robust_outliers
from sac2mseed_spark.operators.streaks import activity_streaks

H = 3_600_000_000  # 1h in µs


def _tier(spark, rows):
    return spark.createDataFrame(
        [(c, i * H, v) for c, i, v in rows],
        "conv_id string, window_start_us long, sum_tokens long",
    )


def test_streaks_islands_and_tie_break(spark):
    # A: runs {0,1,2}, {5,6}, {10};  B: {0,1}, {4,5} — tie, earliest wins
    tier = _tier(
        spark,
        [("A", i, 1) for i in (0, 1, 2, 5, 6, 10)]
        + [("B", i, 1) for i in (0, 1, 4, 5)],
    )
    got = {
        r["conv_id"]: r
        for r in activity_streaks(tier, "1h").collect()
    }
    a, b = got["A"], got["B"]
    assert (a["n_windows"], a["n_streaks"], a["longest_streak"]) == (6, 3, 3)
    assert a["longest_start_us"] == 0
    assert (b["n_windows"], b["n_streaks"], b["longest_streak"]) == (4, 2, 2)
    assert b["longest_start_us"] == 0  # tie broke to the earlier run


def test_streaks_rejects_unknown_tier(spark):
    with pytest.raises(ValueError):
        activity_streaks(_tier(spark, [("A", 0, 1)]), "5m")


def test_robust_outliers_flags_only_the_spike(spark):
    # sorted values 10x4,12x4,1000 -> med 12, |dev| median (MAD) = 2
    vals = [10, 12, 10, 12, 10, 12, 10, 12, 1000]
    tier = _tier(spark, [("A", i, v) for i, v in enumerate(vals)])
    rows = robust_outliers(tier, tau=3.5, min_windows=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["value"], r["med"], r["mad"]) == (1000, 12.0, 2.0)
    assert r["rz"] == round(0.6745 * (1000 - 12.0) / 2.0, 6)


def test_robust_outliers_guards(spark):
    # constant series (MAD 0) and short series produce no rows
    tier = _tier(
        spark,
        [("C", i, 7) for i in range(10)] + [("S", i, i * 100) for i in range(3)],
    )
    assert robust_outliers(tier, tau=0.0, min_windows=8).count() == 0
    with pytest.raises(ValueError):
        robust_outliers(tier, min_windows=1)


def test_tool_cooccurrence_jaccard(spark):
    t = spark.createDataFrame(
        [
            ("c1", 0, "a"), ("c1", 1, "b"), ("c1", 2, "a"),
            ("c2", 0, "a"), ("c2", 1, "b"), ("c2", 2, "c"),
            ("c3", 0, "a"), ("c3", 1, None), ("c3", 2, " "),
        ],
        "conv_id string, turn_idx int, tool string",
    )
    got = {
        (r["tool_a"], r["tool_b"]): r for r in tool_cooccurrence(t).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = got[("a", "b")]
    assert (ab["n_ab"], ab["n_a"], ab["n_b"]) == (2, 3, 2)
    assert ab["jaccard"] == round(2 / 3, 6)
    assert got[("a", "c")]["n_ab"] == 1


def test_term_cooccurrence_topk_bounds_pairs(spark):
    from sac2mseed_spark.operators.cooccur import term_cooccurrence

    docs = spark.createDataFrame(
        [
            # top-2 by tf with term-asc tie: d1 -> {alpha, beta}
            (1, "alpha alpha beta beta gamma"),
            (2, "alpha alpha beta beta delta"),
            (3, "alpha alpha zeta zeta zeta"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["term_a"], r["term_b"]): r
        for r in term_cooccurrence(docs, k=2).collect()
    }
    # k=2 -> exactly one pair per doc; (alpha, beta) shared by d1+d2
    assert set(got) == {("alpha", "beta"), ("alpha", "zeta")}
    ab = got[("alpha", "beta")]
    assert (ab["n_ab"], ab["n_a"], ab["n_b"]) == (2, 3, 2)
    assert ab["jaccard"] == round(2 / 3, 6)
