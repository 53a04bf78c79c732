"""Transcripts -> SFT training pairs, and context-budget fit audit.

The terminal step of a conversation-data pipeline is emitting training
examples: adjacent (user -> assistant) turn pairs with quality gates and
stable content digests for downstream dedup/lineage. Reference analogue:
the record emission loop that turns an accepted trace segment into output
records with derived headers (`/root/reference/sac2mseed.c:553-600` writes
one record group per accepted trace) — here an "accepted segment" is a
user turn immediately answered by an assistant turn.

Both operators are single-exchange by construction: every window and
aggregate below is partitioned by conv_id, so Catalyst plans ONE hash
exchange on conv_id and keeps the lag window, the kept-pair re-numbering,
and the per-conversation aggregate in the same stage chain. Nothing here
shuffles the text column twice: digests are computed in the same project
that reads the text, and only 8-byte digests + integer metrics survive
into the output (the 100 TB shape — text bytes never re-exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h60

# quality gates shared by the engine and the oracle twin
MIN_PROMPT_TOKENS = 2
MIN_RESPONSE_TOKENS = 3
MAX_PAIR_TOKENS = 1000


def sft_pairs(
    metrics: DataFrame,
    min_prompt_tokens: int = MIN_PROMPT_TOKENS,
    min_response_tokens: int = MIN_RESPONSE_TOKENS,
    max_pair_tokens: int = MAX_PAIR_TOKENS,
) -> DataFrame:
    """Adjacent user->assistant turn pairs as SFT candidates.

    Input: turn metrics (conv_id, turn_idx, role, text, ts_us,
    token_count). Output one row per assistant turn whose immediate
    predecessor in the stable (turn_idx, ts_us) order is a user turn:

      (conv_id, user_turn_idx, assistant_turn_idx, prompt_tokens,
       response_tokens, pair_tokens, response_latency_us,
       prompt_digest, response_digest, kept, pair_idx)

    ``kept`` applies the token-bound quality gates; ``pair_idx`` numbers
    the KEPT pairs 1..n within each conversation (NULL for dropped ones)
    so shard writers can key on (conv_id, pair_idx) directly.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts_us")
    paired = (
        metrics.select(
            "conv_id",
            "turn_idx",
            "role",
            "ts_us",
            "token_count",
            h60(F.col("text")).alias("digest"),
        )
        .withColumn("prev_role", F.lag("role").over(w))
        .withColumn("prev_turn_idx", F.lag("turn_idx").over(w))
        .withColumn("prev_ts_us", F.lag("ts_us").over(w))
        .withColumn("prev_tokens", F.lag("token_count").over(w))
        .withColumn("prev_digest", F.lag("digest").over(w))
        .filter((F.col("role") == "assistant") & (F.col("prev_role") == "user"))
    )
    kept = (
        (F.col("prompt_tokens") >= min_prompt_tokens)
        & (F.col("response_tokens") >= min_response_tokens)
        & (F.col("pair_tokens") <= max_pair_tokens)
    )
    out = paired.select(
        "conv_id",
        F.col("prev_turn_idx").alias("user_turn_idx"),
        F.col("turn_idx").alias("assistant_turn_idx"),
        F.col("prev_tokens").alias("prompt_tokens"),
        F.col("token_count").alias("response_tokens"),
        (F.col("prev_tokens") + F.col("token_count")).alias("pair_tokens"),
        (F.col("ts_us") - F.col("prev_ts_us")).alias("response_latency_us"),
        F.col("prev_digest").alias("prompt_digest"),
        F.col("digest").alias("response_digest"),
    ).withColumn("kept", kept)
    wk = Window.partitionBy("conv_id").orderBy("assistant_turn_idx")
    # row_number over kept rows only; same partition key -> no new exchange
    return out.withColumn(
        "pair_idx",
        F.when(
            F.col("kept"),
            F.sum(F.col("kept").cast("int")).over(wk).cast("int"),
        ),
    )


# context budget for the fit audit (tokens)
CONTEXT_BUDGET_TOKENS = 500


def context_fit(
    metrics: DataFrame, budget_tokens: int = CONTEXT_BUDGET_TOKENS
) -> DataFrame:
    """Per-conversation context-window fit: how much of the conversation's
    TAIL fits a fixed token budget (the truncate-from-the-left rule every
    chat trainer applies).

    Returns (conv_id, n_turns, total_tokens, n_turns_fit, tokens_fit,
    fit_frac): the longest suffix of turns in stable order whose token
    sum is <= budget_tokens. One conv-partitioned window (reverse
    running sum) + one aggregate over the same key — a single exchange.
    fit_frac is rounded 6dp.
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.desc("turn_idx"), F.desc("ts_us"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tail = metrics.select(
        "conv_id",
        "token_count",
        F.sum("token_count").over(w).alias("suffix_tokens"),
    )
    fits = (F.col("suffix_tokens") <= budget_tokens).cast("int")
    return tail.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("token_count").alias("total_tokens"),
        F.sum(fits).cast("long").alias("n_turns_fit"),
        F.coalesce(
            F.max(
                F.when(
                    F.col("suffix_tokens") <= budget_tokens,
                    F.col("suffix_tokens"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("tokens_fit"),
        F.round(
            F.sum(fits).cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("fit_frac"),
    )


# a prompt becomes a preference candidate once it has this many distinct
# responses across the corpus
PREF_MIN_RESPONSES = 2


def preference_pairs(
    metrics: DataFrame, min_responses: int = PREF_MIN_RESPONSES
) -> DataFrame:
    """RLHF-style preference candidates: prompts answered by >= 2 distinct
    responses across the corpus, with a deterministic chosen/rejected
    assignment.

    A retried, regenerated, or templated user prompt that received
    different assistant responses in different conversations is the raw
    material of preference training. This operator groups every
    user->assistant exchange by the prompt's content digest and, for
    prompts with >= ``min_responses`` distinct response digests, emits ONE
    row: the "chosen" response (most tokens, then lowest observed latency,
    then lowest digest — a documented heuristic standing in for a reward
    model; any scorer can replace the ordering key) and the "rejected"
    response (the same total order's last element). Reference analogue:
    the duplicate-header grouping that folds records with identical
    srcnames into one trace and keeps per-trace extremes
    (`/root/reference/libmseed/traceutils.c:461-508`).

    Output: (prompt_digest, prompt_tokens, n_responses, n_exchanges,
    chosen_digest, chosen_tokens, chosen_latency_us, rejected_digest,
    rejected_tokens, token_margin).

    Scale shape: text is digested in the same project that reads it, so
    both aggregates exchange only 8-byte digests + integers. The
    chosen/rejected selection is a map-side-combinable min/max over a
    lexicographic struct key — no window over the corpus-wide prompt
    groups, so one hot prompt (a template answered a million times) costs
    a partial aggregate, not a sort.
    """
    if min_responses < 2:
        raise ValueError(f"min_responses must be >= 2, got {min_responses}")
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts_us")
    ex = (
        metrics.select(
            "conv_id",
            "turn_idx",
            "role",
            "ts_us",
            F.col("token_count").cast("long").alias("token_count"),
            h60(F.col("text")).alias("digest"),
        )
        .withColumn("prev_role", F.lag("role").over(w))
        .withColumn("prev_ts_us", F.lag("ts_us").over(w))
        .withColumn("prev_tokens", F.lag("token_count").over(w))
        .withColumn("prev_digest", F.lag("digest").over(w))
        .filter((F.col("role") == "assistant") & (F.col("prev_role") == "user"))
    )
    resp = ex.groupBy(
        F.col("prev_digest").alias("prompt_digest"),
        F.col("digest").alias("response_digest"),
    ).agg(
        # identical text => identical token count; min() is exact
        F.min("prev_tokens").alias("prompt_tokens"),
        F.min("token_count").alias("response_tokens"),
        F.min(F.col("ts_us") - F.col("prev_ts_us")).alias("min_latency_us"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    # total order: tokens DESC, latency ASC, digest ASC. struct max/min give
    # the first/last element of that order (digests are 60-bit, so negation
    # never overflows).
    key = F.struct(
        F.col("response_tokens").alias("tok"),
        (-F.col("min_latency_us")).alias("neg_lat"),
        (-F.col("response_digest")).alias("neg_dig"),
    )
    return (
        resp.groupBy("prompt_digest")
        .agg(
            F.min("prompt_tokens").alias("prompt_tokens"),
            F.count(F.lit(1)).alias("n_responses"),
            F.sum("n_occ").alias("n_exchanges"),
            F.max(key).alias("ck"),
            F.min(key).alias("rk"),
        )
        .filter(F.col("n_responses") >= min_responses)
        .select(
            "prompt_digest",
            "prompt_tokens",
            "n_responses",
            "n_exchanges",
            (-F.col("ck.neg_dig")).alias("chosen_digest"),
            F.col("ck.tok").alias("chosen_tokens"),
            (-F.col("ck.neg_lat")).alias("chosen_latency_us"),
            (-F.col("rk.neg_dig")).alias("rejected_digest"),
            F.col("rk.tok").alias("rejected_tokens"),
            (F.col("ck.tok") - F.col("rk.tok")).alias("token_margin"),
        )
    )
