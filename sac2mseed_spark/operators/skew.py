"""Skew handling: deterministic sub-window chunking + adaptive plan choice.

North-rule requirement: salted repartitioning on (conv_id, epoch_bucket)
with explicit skew splitting for hot conversations. Here the salt IS the
chunk_id: grouping on (conv_id, window, chunk_id) hash-spreads one hot
conversation's rows across reducers, and because chunk_id is a pure
function of turn_idx the re-assembled payload is bit-identical at any
parallelism. heavy_hitters() supplies the sampled statistics that decide
WHEN to pay the two-phase salted plan (pack.py pack_tier_adaptive).

Design (SURVEY.md §4.1): the packed payload is a sequence of self-contained
*chunks* (the Steim-frame analogue — each 64-byte Steim frame re-anchors at
w0, /root/reference/libmseed/steimdata.h:16-44). Chunk membership is a pure
function of the row — ``chunk_id = floor(turn_idx / CHUNK_POINTS)`` — so a
hot (conv_id, window) group splits across executors deterministically and
the final blob is BIT-IDENTICAL no matter how many tasks packed it.
Partial-encode (per chunk) + final-assemble (per window) mirrors Spark's own
partial/final aggregation.

The salt column spreads chunk groups uniformly; for aggregates Spark's
map-side partial aggregation already neutralizes skew, so salting is only
applied on the grouped-UDF (pack) path where a group cannot be split by the
engine itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Max points per packed chunk. Fixed constant => deterministic chunk
# boundaries at any parallelism (bit-exactness across plans).
CHUNK_POINTS = 4096


def with_chunk_id(df: DataFrame, turn_idx_col: str = "turn_idx") -> DataFrame:
    return df.withColumn(
        "chunk_id", F.floor(F.col(turn_idx_col) / CHUNK_POINTS).cast("int")
    )


def heavy_hitters(df: DataFrame, keys: list[str], threshold: int, sample_frac: float = 0.01) -> DataFrame:
    """Sampled heavy-hitter detection driving the adaptive pack-plan choice
    (operators/pack.py pack_tier_adaptive).

    At 100 TB a full count per key is itself a shuffle of the full data; a
    1% Bernoulli sample bounds the planning cost, mirroring how AQE sizes
    skew splits from map output statistics. The skew *split* itself is the
    deterministic chunk_id (above) — grouping on (keys…, chunk_id) is what
    spreads a hot key across reducers, salting-by-construction with
    bit-identical output at any parallelism.
    """
    est = (
        df.sample(fraction=sample_frac, seed=42)
        .groupBy(*keys)
        .count()
        .withColumn("est_rows", (F.col("count") / sample_frac).cast("long"))
        .drop("count")
    )
    return est.filter(F.col("est_rows") >= threshold)
