"""Degenerate-loop detection: consecutive same-role turn self-similarity.

Agent transcripts fail in a characteristic way: the assistant (or a
tool) emits the SAME message over and over — a retry loop, a stuck
planner, an error message cycling for hundreds of turns. The reference
engine's analogue is trace-segment healing of repeated/overlapping
records (libmseed traceutils.c mst_groupheal); the training-data
analogue is a curation signal — conversations whose consecutive
same-role turns are near-identical should be down-weighted or cut at
the loop start before the corpus reaches a trainer.

Per (conv, role) we compare each turn's whitespace-token SET to the
previous turn of the SAME role (rank within role, not raw adjacency —
user/assistant alternation would otherwise hide assistant loops) and
score Jaccard similarity. A pair with union 0 (two empty turns) is
defined as Jaccard 1.0: an empty message repeated IS a loop.

Float-determinism: intersection and union sizes are exact integers;
Jaccard is ONE float division rounded 6dp, max_jaccard a max over
those rounded values — engine-order-proof on both sides.

Scale shape: text never shuffles. Tokens are exploded once, digested
to 60-bit ints (functions/hashing.h60), and deduped per turn; the
consecutive-pair intersection needs NO self-join — one lead() window
over the distinct (conv, role, term_h) stream marks every term whose
next appearance rank is rank+1, so the token relation crosses exactly
one wide exchange. Pair sizes come from a (conv, role) window over
per-turn type counts (one narrow exchange), and zero-intersection
pairs survive via a left join from the pair frame. At 10^12 turns
every shuffled row is ~32 bytes of ints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h60
from ..functions.text import ws_tokens


def repetition_loops(
    transcripts: DataFrame,
    threshold: float = 0.9,
    min_pairs: int = 3,
) -> DataFrame:
    """Per (conv_id, role) repetition report.

    Returns (conv_id, role, n_pairs, n_repeats, repeat_ratio,
    max_jaccard) for roles with >= min_pairs consecutive-turn pairs;
    a pair "repeats" when its token-set Jaccard >= threshold.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    order = Window.partitionBy("conv_id", "role").orderBy(
        "turn_idx", F.col("ts").cast("timestamp")
    )
    turns = transcripts.select(
        "conv_id",
        "role",
        F.row_number().over(order).alias("rn"),
        ws_tokens("text").alias("toks"),
    )

    # distinct token digests per turn (set semantics for Jaccard)
    terms = turns.select(
        "conv_id", "role", "rn", F.explode("toks").alias("term")
    ).select(
        "conv_id", "role", "rn", h60(F.col("term")).alias("term_h")
    ).distinct()

    # per-turn set size (0 for empty turns — terms has no row for them)
    sizes = (
        turns.select("conv_id", "role", "rn")
        .join(
            terms.groupBy("conv_id", "role", "rn").agg(
                F.count(F.lit(1)).alias("sz")
            ),
            ["conv_id", "role", "rn"],
            "left",
        )
        .select(
            "conv_id", "role", "rn", F.coalesce("sz", F.lit(0)).alias("sz")
        )
    )

    # consecutive same-role pairs: pair p joins turn rn=p (prev) with
    # rn=p+1 (cur); sizes via lead() on one (conv, role) exchange
    w = Window.partitionBy("conv_id", "role").orderBy("rn")
    pairs = (
        sizes.withColumn("sz_next", F.lead("sz").over(w))
        .filter(F.col("sz_next").isNotNull())
        .select(
            "conv_id",
            "role",
            F.col("rn").alias("p"),
            (F.col("sz") + F.col("sz_next")).alias("sz_sum"),
        )
    )

    # intersection counts WITHOUT a self-join: a term is in the
    # intersection of pair p exactly when its next appearance rank (per
    # conv/role/term) is p+1, so ONE lead() window over the distinct
    # term stream replaces re-shuffling it twice through an equi-join —
    # the same linear-pass-over-sorted-runs idea as the reference's
    # adjacent-trace matching (libmseed traceutils.c mst_findadjacent)
    wt = Window.partitionBy("conv_id", "role", "term_h").orderBy("rn")
    inter = (
        terms.withColumn("next_rn", F.lead("rn").over(wt))
        .filter(F.col("next_rn") == F.col("rn") + 1)
        .groupBy("conv_id", "role", F.col("rn").alias("p"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )

    ji = pairs.join(inter, ["conv_id", "role", "p"], "left").select(
        "conv_id",
        "role",
        F.coalesce("n_inter", F.lit(0)).alias("n_inter"),
        (F.col("sz_sum") - F.coalesce("n_inter", F.lit(0))).alias("n_union"),
    )
    jacc = F.when(F.col("n_union") == 0, F.lit(1.0)).otherwise(
        F.round(
            F.col("n_inter").cast("double") / F.col("n_union").cast("double"),
            6,
        )
    )
    scored = ji.select("conv_id", "role", jacc.alias("jacc"))

    return (
        scored.groupBy("conv_id", "role")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum((F.col("jacc") >= threshold).cast("long")).alias(
                "n_repeats"
            ),
            F.max("jacc").alias("max_jaccard"),
        )
        .filter(F.col("n_pairs") >= min_pairs)
        .select(
            "conv_id",
            "role",
            "n_pairs",
            "n_repeats",
            F.round(
                F.col("n_repeats").cast("double")
                / F.col("n_pairs").cast("double"),
                6,
            ).alias("repeat_ratio"),
            "max_jaccard",
        )
    )
