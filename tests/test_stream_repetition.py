"""Streaming repetition monitor equals the batch loop detector.

The stateful twin (streaming/rollup_stream.stream_repetition) keeps one
previous digest set + rank per (conv_id, role); fed the same turns in
append order split across micro-batches, its emitted pair log must
aggregate exactly to operators/repetition.repetition_loops (after the
batch query's 6dp presentation rounding is applied to the raw stream
quotients).
"""

from pyspark.sql import functions as F

from sac2mseed_spark.operators.repetition import repetition_loops
from sac2mseed_spark.sources.transcripts import generate_transcripts
from sac2mseed_spark.streaming.rollup_stream import stream_repetition


def test_stream_repetition_matches_batch_across_microbatches(spark, tmp_path):
    t = generate_transcripts(spark, "t_small", seed=31).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    cut = t.agg(F.expr("percentile_approx(turn_idx, 0.5)")).collect()[0][0]
    src = str(tmp_path / "in")
    t.filter(F.col("turn_idx") < cut).write.mode("overwrite").parquet(src)
    t.filter(F.col("turn_idx") >= cut).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "out")
    q = (
        stream_repetition(stream, threshold=0.9)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    emitted = spark.read.parquet(out).withColumn(
        "jacc6", F.round("jacc", 6)
    )
    got = {
        (r["conv_id"], r["role"]): (
            r["n_pairs"], r["n_repeats"], r["max_jaccard"]
        )
        for r in emitted.groupBy("conv_id", "role")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum((F.col("jacc6") >= 0.9).cast("long")).alias("n_repeats"),
            F.max("jacc6").alias("max_jaccard"),
        )
        .collect()
    }
    want = {
        (r["conv_id"], r["role"]): (
            r["n_pairs"], r["n_repeats"], r["max_jaccard"]
        )
        for r in repetition_loops(t, threshold=0.9, min_pairs=1).collect()
    }
    assert got == want
    assert len(want) > 0
    # integer invariants survive the wire: unions never negative,
    # intersections bounded by unions
    bad = spark.read.parquet(out).filter(
        (F.col("n_union") < 0) | (F.col("n_inter") > F.col("n_union"))
        & (F.col("n_union") > 0)
    )
    assert bad.count() == 0
