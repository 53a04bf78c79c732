"""Per-day shingle novelty: closed-form checks.

Engine-vs-oracle parity at sf0.01 is covered by the driver harness
(`shingle_novelty`).
"""

from sac2mseed_spark.operators.novelty import DAY_US, shingle_novelty


def test_shingle_novelty_first_day_is_fully_novel(spark):
    # day 0: "a b c d" -> shingles {a b c, b c d}
    # day 1: "a b c d e" -> {a b c, b c d, c d e}: one new of three
    # day 2: exact repeat of day 0 -> nothing new
    t = spark.createDataFrame(
        [
            ("a b c d", 10),
            ("a b c d e", DAY_US + 5),
            ("a b c d", 2 * DAY_US + 7),
        ],
        "text string, ts_us long",
    )
    got = {r["day_start_us"]: r for r in shingle_novelty(t).collect()}
    assert (got[0]["n_shingles"], got[0]["n_new"]) == (2, 2)
    assert got[0]["novelty_share"] == 1.0
    d1 = got[DAY_US]
    assert (d1["n_shingles"], d1["n_new"]) == (3, 1)
    assert d1["novelty_share"] == round(1 / 3, 6)
    d2 = got[2 * DAY_US]
    assert (d2["n_shingles"], d2["n_new"]) == (2, 0)
    assert d2["novelty_share"] == 0.0


def test_shingle_novelty_within_day_repeats_count_once(spark):
    # the same shingle seen 100x in one day is ONE distinct observation
    t = spark.createDataFrame(
        [("x y z", i) for i in range(100)],
        "text string, ts_us long",
    )
    rows = shingle_novelty(t).collect()
    assert len(rows) == 1
    assert (rows[0]["n_shingles"], rows[0]["n_new"]) == (1, 1)
