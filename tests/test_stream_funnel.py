"""Streaming funnel equals the batch min-after-min operator.

The stateful twin (streaming/rollup_stream.stream_funnel) keeps only
len(steps) timestamps per conv_id; fed the same turns in append order
— split across micro-batches so step completions straddle the batch
edge — its LAST emitted row per conversation must equal
operators/funnel.funnel_steps over the full data.
"""

from pyspark.sql import functions as F

from sac2mseed_spark.functions.metrics import derive_turn_metrics
from sac2mseed_spark.operators.funnel import funnel_steps
from sac2mseed_spark.sources.transcripts import generate_transcripts
from sac2mseed_spark.streaming.rollup_stream import stream_funnel


def test_stream_funnel_matches_batch_across_microbatches(spark, tmp_path):
    t = generate_transcripts(spark, "t_small", seed=23)
    m = derive_turn_metrics(t).select("conv_id", "role", "ts_us")
    cut = m.agg(F.expr("percentile_approx(ts_us, 0.5)")).collect()[0][0]
    src = str(tmp_path / "in")
    m.filter(F.col("ts_us") < cut).write.mode("overwrite").parquet(src)
    m.filter(F.col("ts_us") >= cut).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(m.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "out")
    q = (
        stream_funnel(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    emitted = spark.read.parquet(out)
    # progressive emissions: keep each conv's most-advanced row
    last = {
        r["conv_id"]: r
        for r in emitted.orderBy("steps_completed").collect()
    }
    batch = {r["conv_id"]: r for r in funnel_steps(m).collect()}
    # every conv that reached step 1 must have emitted
    reached = {k: v for k, v in batch.items() if v["steps_completed"] > 0}
    assert set(last) == set(reached)
    for cid, b in reached.items():
        s = last[cid]
        assert (
            s["t1_us"], s["t2_us"], s["t3_us"], s["steps_completed"]
        ) == (
            b["t1_us"], b["t2_us"], b["t3_us"], b["steps_completed"]
        ), cid
