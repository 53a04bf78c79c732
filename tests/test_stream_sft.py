"""Streaming SFT pair extraction equals the batch operator.

stream_sft_pairs keeps ONE previous turn + the kept-pair counter per
conv_id; fed the same turns in append order split across micro-batches,
its emitted rows must equal operators/sft.sft_pairs row-for-row —
including the kept-pair numbering, which crosses micro-batch boundaries
through the counter in the state store.
"""

from pyspark.sql import functions as F

from sac2mseed_spark.functions.metrics import derive_turn_metrics
from sac2mseed_spark.operators.sft import sft_pairs
from sac2mseed_spark.sources.transcripts import generate_transcripts
from sac2mseed_spark.streaming.rollup_stream import stream_sft_pairs


def test_stream_sft_matches_batch_across_microbatches(spark, tmp_path):
    t = generate_transcripts(spark, "t_small", seed=17).select(
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
        stream_sft_pairs(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    cols = [
        "conv_id",
        "user_turn_idx",
        "assistant_turn_idx",
        "prompt_tokens",
        "response_tokens",
        "pair_tokens",
        "response_latency_us",
        "prompt_digest",
        "response_digest",
        "kept",
        "pair_idx",
    ]

    def key(r):
        return tuple(r[c] for c in cols)

    got = sorted(key(r) for r in spark.read.parquet(out).collect())
    want = sorted(key(r) for r in sft_pairs(derive_turn_metrics(t)).collect())
    assert len(want) > 0
    assert got == want
    # the kept-pair numbering crossed the micro-batch boundary: at least
    # one conversation has pairs on both sides of the turn_idx cut
    spanning = (
        spark.read.parquet(out)
        .filter("kept")
        .groupBy("conv_id")
        .agg(
            F.min("assistant_turn_idx").alias("lo"),
            F.max("assistant_turn_idx").alias("hi"),
            F.max("pair_idx").alias("n"),
        )
        .filter((F.col("lo") < cut) & (F.col("hi") >= cut) & (F.col("n") > 1))
    )
    assert spanning.count() > 0
