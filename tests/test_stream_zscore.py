"""Streaming z-score anomaly detector equals the batch ROWS-frame operator.

The stateful twin (streaming/rollup_stream.stream_zscore_anomalies) keeps
only the last k values per conv_id; fed the same finalized tier rows in
append order — split across micro-batches so trailing windows straddle
the batch edge — it must emit exactly the batch operator's anomaly set
(operators/anomaly.zscore_anomalies), with z equal at the 6dp rounding
the batch query applies.
"""

import pytest
from pyspark.sql import functions as F

from sac2mseed_spark.functions.metrics import derive_turn_metrics
from sac2mseed_spark.operators.anomaly import zscore_anomalies
from sac2mseed_spark.operators.rollup import rollup_from_turns
from sac2mseed_spark.sources.transcripts import generate_transcripts
from sac2mseed_spark.streaming.rollup_stream import stream_zscore_anomalies

K = 4
TAU = 1.0


def test_stream_zscore_matches_batch_across_microbatches(spark, tmp_path):
    t = generate_transcripts(spark, "t_small", seed=11)
    tier = rollup_from_turns(derive_turn_metrics(t), "1m").select(
        "conv_id", "window_start_us", "sum_tokens"
    )
    # append-ordered delivery: split mid-history so every conversation's
    # trailing k-window straddles the micro-batch edge
    cut = tier.agg(
        F.expr("percentile_approx(window_start_us, 0.5)")
    ).collect()[0][0]
    src = str(tmp_path / "in")
    tier.filter(F.col("window_start_us") < cut).write.mode(
        "overwrite"
    ).parquet(src)
    tier.filter(F.col("window_start_us") >= cut).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(tier.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    det = stream_zscore_anomalies(stream, k=K, tau=TAU)
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
        (r["conv_id"], r["window_start_us"], r["value"], round(r["z"], 6))
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["conv_id"], r["window_start_us"], r["value"], r["z"])
        for r in zscore_anomalies(tier, k=K, tau=TAU).collect()
    }
    assert want, "fixture must produce anomalies for the test to be meaningful"
    assert got == want


def test_stream_zscore_state_bounded_and_validated(spark):
    df = spark.range(1).selectExpr(
        "'c' AS conv_id", "CAST(1 AS long) AS window_start_us",
        "CAST(1 AS long) AS sum_tokens"
    )
    with pytest.raises(ValueError):
        stream_zscore_anomalies(df, k=1)
