"""Generator determinism + schema + per-row text-equality invariant."""

from pyspark.sql import functions as F

from sac2mseed_spark.sources.transcripts import FIXTURES, generate_transcripts

EXPECTED_SCHEMA = [
    ("conv_id", "string"),
    ("turn_idx", "int"),
    ("role", "string"),
    ("text", "string"),
    ("tool", "string"),
    ("ts", "timestamp"),
]


def test_schema_matches_input_hint(spark):
    df = generate_transcripts(spark, "t_small")
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == EXPECTED_SCHEMA


def test_deterministic_across_parallelism(spark):
    """Same rows at parallelism 2 and 8 — the generator is a pure function
    of (seed, conv_id, turn_idx)."""
    a = generate_transcripts(spark, "t_small", parallelism=2)
    b = generate_transcripts(spark, "t_small", parallelism=8)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_monotonic_ts_within_conv(spark):
    df = generate_transcripts(spark, "t_small")
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bad = (
        df.withColumn("prev", F.lag("ts").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("ts") <= F.col("prev")))
        .count()
    )
    assert bad == 0


def test_text_equality_invariant_after_repartition(spark):
    """Per-turn text equality under stable (conv_id, turn_idx, ts) ordering
    survives an arbitrary repartition round-trip (BASELINE.json input_hint)."""
    df = generate_transcripts(spark, "t_small")
    shuffled = df.repartition(16, F.xxhash64("text"))
    joined = df.alias("a").join(
        shuffled.alias("b"), on=["conv_id", "turn_idx", "ts"], how="full"
    )
    mismatch = joined.filter(
        (F.col("a.text") != F.col("b.text"))
        | F.col("a.text").isNull()
        | F.col("b.text").isNull()
    )
    assert mismatch.count() == 0


def test_hot_fixture_sizes(spark):
    df = generate_transcripts(spark, "t_hot")
    sizes = dict(
        df.groupBy("conv_id").count().orderBy(F.desc("count")).limit(3).collect()
    )
    assert all(v == FIXTURES["t_hot"].hot_turns for v in sizes.values())


def test_edge_fixture_has_empty_text_and_dup_ts(spark):
    df = generate_transcripts(spark, "t_edge")
    assert df.filter(F.col("text") == "").count() > 0
    dups = df.groupBy("conv_id", "ts").count().filter("count > 1").count()
    assert dups > 0
