"""Contamination screen: true positives, clean docs, short-text path."""

from pyspark.sql import functions as F

from sac2mseed_spark.operators.contamination import contamination_screen


def _docs(spark):
    bench_text = "the quick brown fox jumps over the lazy dog"
    rows = [
        (0, bench_text),  # benchmark
        (1, "completely different benchmark content here today"),  # benchmark
        # corpus: full leak of bench 0 with a prefix
        (10, "prefix words then " + bench_text),
        # corpus: clean
        (11, "nothing in common with any benchmark document at all"),
        # corpus: short text (< k tokens -> whole-text shingle), no match
        (12, "tiny doc"),
        # corpus: short text equal to a benchmark SHINGLE -> exact hit
        (13, "quick brown fox"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_semantics(spark):
    out = {
        r["doc_id"]: r
        for r in contamination_screen(
            _docs(spark), F.col("doc_id") < 10
        ).collect()
    }
    assert set(out) == {10, 11, 12, 13}
    # doc 10: 12 tokens -> 10 shingles; the 7 fox-sentence shingles hit
    assert out[10]["n_shingles"] == 10
    assert out[10]["n_hits"] == 7
    assert out[10]["contam_rate"] == round(7 / 10, 6)
    assert out[11]["n_hits"] == 0 and out[11]["contam_rate"] == 0.0
    # short doc: one whole-text shingle, no benchmark match
    assert out[12]["n_shingles"] == 1 and out[12]["n_hits"] == 0
    # short doc equal to a benchmark 3-gram: exact hit
    assert out[13]["n_shingles"] == 1 and out[13]["n_hits"] == 1
    assert out[13]["contam_rate"] == 1.0


def test_repeated_leak_counts_instances(spark):
    leak = "alpha beta gamma"
    docs = spark.createDataFrame(
        [(0, leak), (10, " ".join([leak] * 3))],
        "doc_id long, text string",
    )
    out = contamination_screen(docs, F.col("doc_id") < 10).collect()[0]
    # 9 tokens -> 7 shingles; 'alpha beta gamma' appears at offsets 0,3,6
    assert out["n_shingles"] == 7
    assert out["n_hits"] == 3
