"""Streaming burst detector equals the batch RANGE-frame operator."""

import pytest
from pyspark.sql import functions as F

from sac2mseed_spark.functions.metrics import derive_turn_metrics
from sac2mseed_spark.operators.rate import bursts
from sac2mseed_spark.sources.transcripts import generate_transcripts
from sac2mseed_spark.streaming.rollup_stream import (
    stream_burst_detect,
    stream_turn_metrics,
)

W = 86_400_000_000
K = 4


def test_stream_bursts_match_batch_across_microbatches(spark, tmp_path):
    t = generate_transcripts(spark, "t_small", seed=7)
    src = str(tmp_path / "in")
    # split mid-conversation so trailing windows straddle the batch edge
    t.filter(F.col("turn_idx") < 25).write.mode("overwrite").parquet(src)
    t.filter(F.col("turn_idx") >= 25).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    det = stream_burst_detect(stream_turn_metrics(stream), W, K)
    out = str(tmp_path / "out")
    q = (
        det.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["conv_id"], r["ts_us"], r["n_in_window"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["conv_id"], r["ts_us"], r["n_in_window"])
        for r in bursts(
            derive_turn_metrics(t), window_us=W, min_events=K
        ).collect()
    }
    assert want, "fixture must produce bursts for the test to be meaningful"
    assert got == want


def test_stream_burst_validation(spark):
    df = spark.range(1).selectExpr("'c' AS conv_id", "CAST(1 AS long) AS ts_us")
    with pytest.raises(ValueError):
        stream_burst_detect(df, window_us=0)
    with pytest.raises(ValueError):
        stream_burst_detect(df, min_events=0)
