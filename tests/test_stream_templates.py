"""Streaming template detection equals the batch removal list.

stream_template_turns keys by text digest with hard-constant state (at
most min_convs conv_ids until crossing, then a flag). Split the same
turns across micro-batches so the threshold is crossed ACROSS a batch
boundary: the emitted digest set must equal template_turns()'s digests,
each digest exactly once, with the occurrence count at crossing correct.
"""

from pyspark.sql import functions as F

from sac2mseed_spark.functions.hashing import h60
from sac2mseed_spark.operators.templates import template_turns
from sac2mseed_spark.streaming.rollup_stream import stream_template_turns


def _turns(spark, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    return df.withColumn(
        "token_count",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long"),
    )


ROWS = [
    # "welcome aboard" in convs a,b (batch 1) then c (batch 2): crosses
    # the >=3 threshold across the boundary, 4th occurrence ignored.
    ("a", 0, "system", "welcome aboard"),
    ("b", 0, "system", "welcome aboard"),
    ("a", 1, "user", "first unique question"),
    ("b", 1, "user", "second unique question"),
    # "ok" in conv a twice + conv b once: only TWO distinct convs -> not
    # a template even though it has 3 occurrences.
    ("a", 2, "assistant", "ok"),
    ("a", 3, "assistant", "ok"),
    ("b", 2, "assistant", "ok"),
]
ROWS2 = [
    ("c", 0, "system", "welcome aboard"),
    ("d", 0, "system", "welcome aboard"),
    ("c", 1, "user", "third unique question"),
    # "bye now" in convs c,d,e inside one batch: in-batch crossing.
    ("c", 2, "assistant", "bye now"),
    ("d", 1, "assistant", "bye now"),
    ("e", 0, "assistant", "bye now"),
]


def test_stream_templates_match_batch_across_microbatches(spark, tmp_path):
    b1, b2 = _turns(spark, ROWS), _turns(spark, ROWS2)
    src = str(tmp_path / "in")
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "out")
    q = (
        stream_template_turns(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out).collect()
    all_turns = b1.unionByName(b2).withColumn("ts_us", F.lit(0))
    want = {
        r["digest"]: r
        for r in template_turns(all_turns.select(
            "conv_id", "role", "text", "token_count"
        )).collect()
    }
    # emitted digest set == batch removal list, one row each
    assert sorted(r["digest"] for r in got) == sorted(want)
    assert len(want) == 2  # "welcome aboard" and "bye now"
    by_digest = {r["digest"]: r for r in got}
    dig_welcome = b1.select(h60(F.lit("welcome aboard"))).first()[0]
    dig_bye = b1.select(h60(F.lit("bye now"))).first()[0]
    # cross-boundary crossing: 3rd distinct conv arrives in batch 2 as
    # the 3rd occurrence; in-batch crossing for "bye now" at its 3rd row
    assert by_digest[dig_welcome]["n_occurrences_at_crossing"] == 3
    assert by_digest[dig_bye]["n_occurrences_at_crossing"] == 3
    for r in got:
        assert r["n_convs"] == 3
        assert r["token_count"] == want[r["digest"]]["token_count"]
