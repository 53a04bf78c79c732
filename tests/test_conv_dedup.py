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
