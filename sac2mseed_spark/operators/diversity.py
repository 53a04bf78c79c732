"""Tool-usage diversity (Gini impurity) per conversation.

A training-data curation pipeline wants a per-conversation measure of
how varied its tool usage is — single-tool grind loops score 0, evenly
mixed tool use scores near 1 − 1/k. Shannon entropy is the textbook
choice but needs log(), whose last-ulp behavior differs between libm
implementations; Gini impurity 1 − Σ(cᵢ/n)² carries the same signal on
purely rational arithmetic, so it replays bit-for-bit in the oracle
(same log-free discipline as the salient-terms operator).

Float-determinism design: counts are exact ints; gini is derived as
(n² − Σcᵢ²)/n² with the squared sums computed in int64 and ONE final
double division, mirrored in the DuckDB oracle.

Scale shape: two groupBys on prefixes of the same key — (conv, tool)
then (conv) — so the second aggregation reuses the first shuffle's
partitioning (Catalyst collapses it to a partial-agg chain). Text
never shuffles; only the tool label and counts do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tool_gini(
    transcripts: DataFrame,
    key_col: str = "conv_id",
    tool_col: str = "tool",
    min_turns: int = 1,
) -> DataFrame:
    """Per-key Gini impurity of the tool distribution.

    Turns with a NULL/empty tool count as the explicit 'none' bucket —
    a conversation that never calls tools is (correctly) zero-
    diversity, not empty. Returns (key, n_turns, n_tools, gini) with
    gini rounded 6dp.
    """
    if min_turns < 1:
        raise ValueError(f"min_turns must be >= 1, got {min_turns}")

    bucket = F.when(
        F.col(tool_col).isNull() | (F.trim(F.col(tool_col)) == ""),
        F.lit("none"),
    ).otherwise(F.col(tool_col))
    per_tool = (
        transcripts.select(F.col(key_col), bucket.alias("__tool"))
        .groupBy(key_col, "__tool")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    agg = per_tool.groupBy(key_col).agg(
        F.sum("__c").alias("n_turns"),
        F.count(F.lit(1)).alias("n_tools"),
        F.sum(F.col("__c") * F.col("__c")).alias("__sc2"),
    )
    n2 = F.col("n_turns") * F.col("n_turns")
    return agg.filter(F.col("n_turns") >= min_turns).select(
        key_col,
        "n_turns",
        "n_tools",
        F.round(
            (n2 - F.col("__sc2")).cast("double") / n2.cast("double"), 6
        ).alias("gini"),
    )
