"""Benchmark-contamination screen for pretraining corpora.

Before training, every corpus must be screened against evaluation sets:
a document sharing enough k-token shingles with a benchmark leaks the
benchmark into the weights. This is the dedup family's machinery
(functions/text.shingles — same normalization, same k) pointed at an
asymmetric pair: a HUGE corpus vs a SMALL benchmark set.

That asymmetry flips the scale shape relative to pair dedup: instead of
an inverted-index self-join (operators/dedup.py), the benchmark's
distinct shingles are small enough to BROADCAST, so the screen is a
map-side broadcast hash join on exploded shingles plus one narrow
groupBy(doc) of (doc_id, hit) rows — no candidate-pair blowup, no
df-cap, corpus read exactly once. At 100 TB the only shuffle is the
per-doc hit aggregation (~bytes per shingle instance, text never moves).

Counting semantics: shingle INSTANCES, not distinct shingles — a doc
that repeats a leaked benchmark sentence 50 times is 50x the evidence,
and instance counting keeps the oracle a plain count/sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles


def contamination_screen(
    docs: DataFrame,
    bench_pred: Column,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-corpus-document overlap with the benchmark shingle set.

    ``bench_pred`` selects the benchmark rows (e.g. ``F.col("doc_id") <
    20``); every other row is corpus. Returns (id, n_shingles, n_hits,
    contam_rate) per corpus doc, where n_shingles counts shingle
    instances and contam_rate = n_hits / n_shingles rounded 6dp (0.0
    for shingle-less docs).
    """
    sh = docs.select(
        F.col(id_col),
        bench_pred.alias("__is_bench"),
        F.explode_outer(shingles(text_col, k)).alias("sh"),
    )
    bench = (
        sh.filter(F.col("__is_bench") & F.col("sh").isNotNull())
        .select("sh")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus = sh.filter(~F.col("__is_bench"))
    joined = corpus.join(F.broadcast(bench), "sh", "left")
    return joined.groupBy(id_col).agg(
        F.count("sh").alias("n_shingles"),
        F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_hits"),
        F.round(
            F.coalesce(F.sum("__hit"), F.lit(0))
            / F.greatest(F.count("sh"), F.lit(1)),
            6,
        ).alias("contam_rate"),
    )
