"""Token-budget shard assignment for training-data exports.

A pretraining exporter slices the curated corpus into shards of ~budget
tokens each (per stratum: a language, a source). Shard membership is a
running-offset computation — shard_id = floor(cumulative_start /
budget) — i.e. a PREFIX SUM over a total order, the one primitive
DataFrame windows do NOT give you at scale: ``Window.partitionBy(
stratum)`` puts an entire stratum in ONE task, which dies at 100 TB.

This operator computes the prefix sum with the classic two-pass
distributed pattern instead:

  1. range-repartition by (stratum, key) so each task holds a contiguous
     slice of the total order,
  2. per-partition token subtotals -> driver (one tiny row per
     partition), cumulated into per-partition base offsets,
  3. broadcast-join the base offsets back; within-partition running sum
     via a window partitioned by (stratum, partition) — bounded by the
     partition size, never the stratum size.

The OUTPUT is partition-count-invariant (base offsets correct for
whatever range boundaries sampling picked): same rows, same shard_id at
any parallelism — asserted by tests/test_shards.py. Oracle: the same
cumulative arithmetic as one DuckDB window over the total order.

A document straddling a budget boundary belongs to the shard its FIRST
token falls in (offset-partitioning semantics): shards overshoot by at
most one document, every shard's start offset is exact, and the rule
stays a pure expression — the greedy close-at-boundary alternative is
inherently sequential and buys nothing a trainer cares about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count


def pack_shards(
    docs: DataFrame,
    budget_tokens: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int | None = None,
) -> DataFrame:
    """Assign each document a (stratum-scoped) shard_id and offset.

    Returns (key, stratum, n_tokens, shard_id, shard_offset) where
    shard_offset is the document's first-token offset within its shard.
    Deterministic in content: the total order is (stratum, key).
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    base = docs.select(
        F.col(key_col).alias("key"),
        F.col(strata_col).alias("stratum"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    if n_parts is None:
        n_parts = max(base.sparkSession.sparkContext.defaultParallelism, 2)
    # persist BEFORE the subtotal pass: repartitionByRange samples its
    # boundaries per-execution, and the base offsets computed from one
    # set of boundaries must be joined against the SAME physical
    # partitioning — without the pin, the second execution could re-draw
    # boundaries and mis-base every offset
    part = (
        base.repartitionByRange(n_parts, "stratum", "key")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    # per-(stratum, partition) subtotals: tiny (one row per stratum per
    # partition), safe to collect and cumulate on the driver
    subtotals = (
        part.groupBy("stratum", "pid")
        .agg(F.sum("n_tokens").alias("sub"))
        .collect()
    )
    bases: dict[tuple, int] = {}
    running: dict[str, int] = {}
    for r in sorted(subtotals, key=lambda r: (r["stratum"], r["pid"])):
        bases[(r["stratum"], r["pid"])] = running.get(r["stratum"], 0)
        running[r["stratum"]] = running.get(r["stratum"], 0) + r["sub"]
    spark = docs.sparkSession
    base_df = spark.createDataFrame(
        [(s, p, b) for (s, p), b in bases.items()],
        "stratum string, pid int, base long",
    )
    w = (
        Window.partitionBy("stratum", "pid")
        .orderBy("key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.col("base") + F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
        "cum_start"
    )
    return (
        part.join(F.broadcast(base_df), ["stratum", "pid"])
        .select("key", "stratum", "n_tokens", start)
        .select(
            "key",
            "stratum",
            "n_tokens",
            F.floor(F.col("cum_start") / budget_tokens)
            .cast("long")
            .alias("shard_id"),
            (F.col("cum_start") % budget_tokens).alias("shard_offset"),
        )
    )


def shard_manifest(shards: DataFrame) -> DataFrame:
    """Per-shard export manifest: document count, token total, key range.

    The sink-side twin (one row per output file, the metadata-CSV
    philosophy of the reference's writemetadata,
    /root/reference/src/sac2mseed.c:944-1100).
    """
    return shards.groupBy("stratum", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("key").alias("first_key"),
        F.max("key").alias("last_key"),
    )
