"""Cross-conversation template/boilerplate turn detection.

Turns whose exact text recurs across many conversations are templates —
system prompts, canned greetings, tool banners. They inflate n-gram and
MinHash dedup statistics, skew language/quality scores, and are usually
masked or dropped before SFT training, so the curation pipeline needs
the removal list as a first-class table. Reference analogue: the
repeated-header detection that collapses identical trace headers into
one StreamState entry (`/root/reference/libmseed/traceutils.c:461-508`
matches new records to existing traces by identical srcname) — here the
"srcname" is the full turn text.

Scale shape: the text column is hashed to a 60-bit digest in the same
project that reads it, so the ONE exchange of the job carries 8-byte
digests + integers, never text (the same discipline as dedup_exact).
One hash aggregate on digest; the template threshold then prunes the
result to the heavy tail before anything else touches it. The corpus
totals used for the share columns are 1-row aggregates folded into the
same scan via a grouping-set-free two-phase count (driver scalar, like
the bm25/tfidf corpus constants). min(token_count) == max(token_count)
per digest by construction (identical text), so min() is exact, not a
sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60

# a text is a template once it appears in at least this many conversations
TEMPLATE_MIN_CONVS = 3


def template_turns(
    metrics: DataFrame, min_convs: int = TEMPLATE_MIN_CONVS
) -> DataFrame:
    """Exact-duplicate turn texts recurring across >= min_convs convs.

    Input needs (conv_id, role, text, token_count). Returns one row per
    template digest: (digest, n_convs, n_occurrences, n_roles,
    token_count, total_tokens, turn_frac) where turn_frac is the share
    of ALL corpus turns this template accounts for (6dp).
    """
    if min_convs < 2:
        raise ValueError(f"min_convs must be >= 2, got {min_convs}")
    hashed = metrics.select(
        "conv_id",
        "role",
        F.col("token_count").cast("long").alias("token_count"),
        h60(F.col("text")).alias("digest"),
    )
    n_turns = hashed.count()
    return (
        hashed.groupBy("digest")
        .agg(
            F.countDistinct("conv_id").alias("n_convs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("role").alias("n_roles"),
            F.min("token_count").alias("token_count"),
            F.sum("token_count").alias("total_tokens"),
        )
        .filter(F.col("n_convs") >= min_convs)
        .withColumn(
            "turn_frac",
            F.round(
                F.col("n_occurrences").cast("double") / F.lit(float(n_turns)), 6
            ),
        )
    )
