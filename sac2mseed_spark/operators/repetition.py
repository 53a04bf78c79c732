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
    # per-turn DISTINCT token-digest array, computed map-side (set
    # semantics for Jaccard): the global distinct over the exploded
    # token stream collapses to array_distinct over each turn's own
    # tokens, so per-turn set sizes cost NO exchange at all and the
    # token stream crosses exactly ONE wide exchange (the per-term
    # occurrence aggregate below) instead of three (distinct + size agg
    # + lead window) — guide §2.4. (An Arrow dictionary-md5 kernel was
    # measured here too — see operators/dedup.simhash — but this
    # relation has TWO consumers, and paying the token-array Arrow
    # transfer twice cost more than the interpreted md5 it saved:
    # 4.35 s vs 3.31 s at sf1.0, so the JVM transform stays.)
    turns = transcripts.select(
        "conv_id",
        "role",
        F.row_number().over(order).alias("rn"),
        F.array_distinct(
            F.transform(ws_tokens("text"), lambda t: h60(t))
        ).alias("harr"),
    )

    sizes = turns.select(
        "conv_id", "role", "rn", F.size("harr").alias("sz")
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
    # intersection of pair p exactly when ranks p and p+1 both appear in
    # its per-(conv, role, term) occurrence set, so ONE hash aggregate
    # over the distinct term stream (map-side partial combine) replaces
    # re-shuffling it through a distinct AND a lead() window — the same
    # linear-pass-over-sorted-runs idea as the reference's adjacent-
    # trace matching (libmseed traceutils.c mst_findadjacent)
    rs = F.array_sort("rns")
    adj = F.filter(
        F.zip_with(
            F.slice(rs, 1, F.size(rs) - 1),
            F.slice(rs, 2, F.size(rs) - 1),
            lambda a, b: F.when(b == a + 1, a),
        ),
        lambda x: x.isNotNull(),
    )
    inter = (
        turns.select(
            "conv_id", "role", "rn", F.explode("harr").alias("term_h")
        )
        .groupBy("conv_id", "role", "term_h")
        .agg(F.collect_set("rn").alias("rns"))
        .select("conv_id", "role", F.explode(adj).alias("p"))
        .groupBy("conv_id", "role", "p")
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
