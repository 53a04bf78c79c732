"""Whole-conversation exact dedup: order-sensitive digest.

Engine-vs-oracle parity at sf0.01 is covered by the driver harness
(`conv_dedup`).
"""

from sac2mseed_spark.operators.convdedup import conv_dedup


def test_conv_dedup_orders_and_groups(spark):
    t = spark.createDataFrame(
        [
            # a1 and a2: identical texts in identical order -> dupes
            ("a1", 0, "hello"), ("a1", 1, "world"),
            ("a2", 0, "hello"), ("a2", 1, "world"),
            # b: same texts, swapped order -> distinct
            ("b", 0, "world"), ("b", 1, "hello"),
            # c: different text
            ("c", 0, "other"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    rows = conv_dedup(t).collect()
    groups = {r["keep_conv"]: r["n_dups"] for r in rows}
    assert groups == {"a1": 2, "b": 1, "c": 1}
    assert len({r["conv_h60"] for r in rows}) == 3


def test_conv_near_dup_jaccard_and_threshold(spark):
    from sac2mseed_spark.operators.convdedup import conv_near_dup

    t = spark.createDataFrame(
        [
            # x and y share 9 of 10 distinct turns -> jaccard 9/11
            *[("x", i, f"t{i}") for i in range(10)],
            *[("y", i, f"t{i+1}") for i in range(10)],
            # z: disjoint
            ("z", 0, "zz"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    rows = conv_near_dup(t, threshold=0.5, df_cap=None).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a"], r["b"], r["inter"]) == ("x", "y", 9)
    assert r["jaccard"] == round(9 / 11, 6)
    # above the pair's jaccard the pair disappears
    assert conv_near_dup(t, threshold=0.9, df_cap=None).count() == 0


def test_conv_near_dup_df_cap_drops_boilerplate(spark):
    from sac2mseed_spark.operators.convdedup import conv_near_dup

    # "ok" appears in all three convs; with df_cap=2 it is dropped, so
    # p/q intersect only on "ok" -> no surviving pair
    t = spark.createDataFrame(
        [
            ("p", 0, "ok"), ("p", 1, "alpha"),
            ("q", 0, "ok"), ("q", 1, "beta"),
            ("r", 0, "ok"), ("r", 1, "gamma"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    assert conv_near_dup(t, threshold=0.1, df_cap=2).count() == 0
    # without the cap the boilerplate-only pairs appear at jaccard 1/3
    rows = conv_near_dup(t, threshold=0.1, df_cap=None).collect()
    assert len(rows) == 3
    assert all(r["jaccard"] == round(1 / 3, 6) for r in rows)


def test_conv_near_dup_repeated_turns_count_once(spark):
    from sac2mseed_spark.operators.convdedup import conv_near_dup

    # repeated identical turns inside one conv are ONE set element
    t = spark.createDataFrame(
        [("u", i, "same") for i in range(5)] + [("v", 0, "same")],
        "conv_id string, turn_idx int, text string",
    )
    rows = conv_near_dup(t, threshold=0.5, df_cap=None).collect()
    assert len(rows) == 1
    assert (rows[0]["inter"], rows[0]["jaccard"]) == (1, 1.0)


def test_conv_dup_clusters_transitive_family(spark):
    from sac2mseed_spark.operators.convdedup import conv_dup_clusters

    # chain c1~c2 (8/12 = 0.667), c2~c3 (0.667), but c1 vs c3 only
    # 6/14 = 0.43 — the component must still merge all three via
    # label propagation even though c1-c3 is not a direct pair
    t = spark.createDataFrame(
        [(f"c{c}", i, f"t{i + 2 * (c - 1)}") for c in (1, 2, 3) for i in range(10)]
        + [("solo", 0, "unique turn")],
        "conv_id string, turn_idx int, text string",
    )
    rows = conv_dup_clusters(t, threshold=0.6, df_cap=None).collect()
    got = {r["conv_id"]: r for r in rows}
    assert set(got) == {"c1", "c2", "c3"}
    assert all(r["cluster_id"] == "c1" and r["cluster_size"] == 3 for r in rows)
