"""SFT pair extraction and context-budget fit: semantics + plan shape."""

import pytest
from pyspark.sql import functions as F

from sac2mseed_spark.operators.sft import context_fit, sft_pairs


def _m(spark, rows):
    """rows: (conv_id, turn_idx, role, text, ts_us) with token_count
    derived as whitespace token count (matching derive_turn_metrics)."""
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts_us long"
    )
    return df.withColumn(
        "token_count",
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .cast("long"),
    )


def test_pairs_only_user_then_assistant(spark):
    m = _m(
        spark,
        [
            ("c", 0, "system", "be nice", 0),
            ("c", 1, "user", "please do the thing", 10),
            ("c", 2, "assistant", "doing the thing now", 25),
            ("c", 3, "assistant", "done with it all", 40),  # prev=assistant
            ("c", 4, "tool", "tool output here", 50),
            ("c", 5, "assistant", "tool based reply", 60),  # prev=tool
        ],
    )
    out = sft_pairs(m).collect()
    assert [(r["user_turn_idx"], r["assistant_turn_idx"]) for r in out] == [(1, 2)]
    r = out[0]
    assert r["prompt_tokens"] == 4 and r["response_tokens"] == 4
    assert r["pair_tokens"] == 8 and r["response_latency_us"] == 15
    assert r["kept"] is True and r["pair_idx"] == 1


def test_quality_gates_and_pair_numbering(spark):
    m = _m(
        spark,
        [
            ("c", 0, "user", "hi", 0),  # prompt_tokens=1 < 2 -> dropped
            ("c", 1, "assistant", "hello there friend", 5),
            ("c", 2, "user", "what is the answer", 10),
            ("c", 3, "assistant", "no", 15),  # response 1 < 3 -> dropped
            ("c", 4, "user", "explain it again", 20),
            ("c", 5, "assistant", "sure here it is", 25),  # kept
            ("c", 6, "user", "thanks a lot", 30),
            ("c", 7, "assistant", "you are most welcome", 35),  # kept
        ],
    )
    out = {r["assistant_turn_idx"]: r for r in sft_pairs(m).collect()}
    assert len(out) == 4
    assert not out[1]["kept"] and out[1]["pair_idx"] is None
    assert not out[3]["kept"] and out[3]["pair_idx"] is None
    assert out[5]["kept"] and out[5]["pair_idx"] == 1
    assert out[7]["kept"] and out[7]["pair_idx"] == 2


def test_digests_stable_and_distinct(spark):
    m = _m(
        spark,
        [
            ("a", 0, "user", "same prompt text", 0),
            ("a", 1, "assistant", "reply one goes here", 1),
            ("b", 0, "user", "same prompt text", 0),
            ("b", 1, "assistant", "reply two goes here", 1),
        ],
    )
    out = sft_pairs(m).collect()
    pd = {r["conv_id"]: r["prompt_digest"] for r in out}
    rd = {r["conv_id"]: r["response_digest"] for r in out}
    assert pd["a"] == pd["b"]  # identical prompts -> identical digest
    assert rd["a"] != rd["b"]


def test_context_fit_suffix_semantics(spark):
    # tokens per turn: 3, 4, 2, 2 ; budget 5 fits the last two (4 tokens)
    m = _m(
        spark,
        [
            ("c", 0, "user", "one two three", 0),
            ("c", 1, "assistant", "a b c d", 10),
            ("c", 2, "user", "x y", 20),
            ("c", 3, "assistant", "p q", 30),
        ],
    )
    r = context_fit(m, budget_tokens=5).collect()[0]
    assert r["n_turns"] == 4 and r["total_tokens"] == 11
    assert r["n_turns_fit"] == 2 and r["tokens_fit"] == 4
    assert r["fit_frac"] == 0.5


def test_context_fit_edges(spark):
    m = _m(spark, [("c", 0, "user", "a b c", 0)])
    whole = context_fit(m, budget_tokens=100).collect()[0]
    assert whole["n_turns_fit"] == 1 and whole["tokens_fit"] == 3
    none = context_fit(m, budget_tokens=2).collect()[0]
    assert none["n_turns_fit"] == 0 and none["tokens_fit"] == 0
    with pytest.raises(ValueError):
        context_fit(m, budget_tokens=-1)


def test_single_exchange_plans(spark):
    m = _m(spark, [("c", 0, "user", "hello there you", 0)])
    for df in (sft_pairs(m), context_fit(m)):
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # one hash exchange on conv_id; no join, no extra shuffle
        n_exchanges = plan.count("Exchange (")
        assert n_exchanges == 1, plan
        assert "hashpartitioning(conv_id" in plan
        assert "Join" not in plan


def test_preference_pairs_selection_and_gating(spark):
    from sac2mseed_spark.operators.sft import preference_pairs

    # same prompt text "what is two plus two" in three convs, three
    # distinct responses; a second prompt answered identically twice
    # (1 distinct response -> excluded); a third prompt seen once.
    m = _m(
        spark,
        [
            ("a", 0, "user", "what is two plus two", 0),
            ("a", 1, "assistant", "four", 100),
            ("b", 0, "user", "what is two plus two", 0),
            ("b", 1, "assistant", "the answer is four exactly", 50),
            ("c", 0, "user", "what is two plus two", 0),
            ("c", 1, "assistant", "it equals four my friend", 200),
            ("d", 0, "user", "say hello to me", 0),
            ("d", 1, "assistant", "hello hello hello", 10),
            ("e", 0, "user", "say hello to me", 0),
            ("e", 1, "assistant", "hello hello hello", 30),
            ("f", 0, "user", "unique prompt here", 0),
            ("f", 1, "assistant", "unique reply text", 5),
        ],
    )
    rows = preference_pairs(m).collect()
    assert len(rows) == 1  # only the 3-distinct-response prompt survives
    r = rows[0]
    assert r["n_responses"] == 3 and r["n_exchanges"] == 3
    assert r["prompt_tokens"] == 5
    # chosen: max tokens (5) with lowest latency -> "the answer is four
    # exactly" (5 tokens, 50us) beats "it equals four my friend" (5, 200)
    assert r["chosen_tokens"] == 5 and r["chosen_latency_us"] == 50
    # rejected: fewest tokens -> "four" (1 token)
    assert r["rejected_tokens"] == 1
    assert r["token_margin"] == 4
    assert r["chosen_digest"] != r["rejected_digest"]


def test_preference_pairs_digest_tiebreak_deterministic(spark):
    from pyspark.sql import functions as F  # noqa: F811

    from sac2mseed_spark.functions.hashing import h60
    from sac2mseed_spark.operators.sft import preference_pairs

    # two responses with IDENTICAL token counts and latencies: the tie
    # must break on the lower digest, both for chosen and rejected.
    m = _m(
        spark,
        [
            ("a", 0, "user", "pick one of these", 0),
            ("a", 1, "assistant", "alpha beta gamma", 100),
            ("b", 0, "user", "pick one of these", 0),
            ("b", 1, "assistant", "delta epsilon zeta", 100),
        ],
    )
    digs = {
        r["text"]: r["d"]
        for r in m.filter("role='assistant'")
        .select("text", h60(F.col("text")).alias("d"))
        .collect()
    }
    lo, hi = sorted(digs.values())
    r = preference_pairs(m).collect()[0]
    assert r["chosen_digest"] == lo and r["rejected_digest"] == hi

    # invalid threshold rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        preference_pairs(m, min_responses=1)
