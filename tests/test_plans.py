"""Physical-plan regression gates: the shapes the 100 TB story depends on.

Timing tests can't catch a silently-degraded plan at sf0.001; these
assert the plan PROPERTIES directly — broadcast vs sort-merge joins,
parquet filter pushdown, column pruning, absence of cartesian products —
so a refactor that keeps results correct but loses the scale shape
fails loudly.
"""

import re

import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _plan(spark, key: str) -> str:
    df = E.queries()[key](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_no_cartesian_products_anywhere(spark):
    # every query in the suite must be free of cartesian/nested-loop joins
    offenders = []
    for key in E.queries():
        plan = _plan(spark, key)
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            offenders.append(key)
    assert offenders == [], f"cartesian/nested-loop joins in: {offenders}"


def test_m4_join_is_broadcast_not_sortmerge(spark):
    plan = _plan(spark, "m4_downsample")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_physical_filter_pushdown_reaches_scan(spark):
    # contamination's benchmark set is doc_id < K on a PHYSICAL parquet
    # column — that predicate must reach the scan. (The transcripts
    # queries filter DERIVED columns (conv_id is computed from events),
    # where pushdown is impossible by design; the 100 TB deployment
    # materializes transcripts, making those prunable too.)
    plan = _plan(spark, "contamination")
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, "no PushedFilters in any scan"
    assert any("doc_id" in p for p in m), m


def test_text_quality_scan_prunes_columns(spark):
    # text_quality touches doc_id/text only; the documents scan must not
    # read lang/source
    plan = _plan(spark, "text_quality")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema in scan"
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert "lang" not in read_cols, read_cols


def test_knn_bruteforce_broadcasts_queries(spark):
    plan = _plan(spark, "knn_bruteforce")
    assert "SortMergeJoin" not in plan


def test_rollup_single_aggregate_exchange(spark):
    # rollup_1m: partial + final hash aggregate around ONE exchange —
    # no window sort, no extra shuffle
    plan = _plan(spark, "rollup_1m")
    # the metrics lag window contributes one exchange; the groupBy the
    # other. More means a lost co-partitioning.
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_ex <= 2, f"rollup_1m plan has {n_ex} exchanges"
    assert "HashAggregate" in plan


def test_asof_attribution_single_shuffle_no_range_join(spark):
    plan = _plan(spark, "asof_attribution")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # union+window form, not a join


def test_ohlc_windows_fold_into_one_aggregate_chain(spark):
    # two row_number directions + groupBy all share the (conv, window)
    # exchange; metrics' lag window contributes the other
    plan = _plan(spark, "ohlc_1h")
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_ex <= 2, f"ohlc_1h plan has {n_ex} exchanges"
    assert "SortMergeJoin" not in plan  # no join-back for first/last


def test_activity_streaks_no_self_join(spark):
    # gaps-and-islands must stay window+agg on one conv partitioning
    plan = _plan(spark, "activity_streaks")
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_ex <= 2, f"activity_streaks plan has {n_ex} exchanges"
    assert "Join" not in plan


def test_window_topk_two_phase_shape(spark):
    # exactly three exchanges: metrics lag (conv), salted local rank
    # (salt, window), exact global rank (window) — losing the salted
    # phase would read as 2, losing co-partitioning as 4+
    plan = _plan(spark, "window_topk")
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_ex == 3, f"window_topk plan has {n_ex} exchanges"
    assert "SortMergeJoin" not in plan


def test_single_aggregate_operators_stay_joinless(spark):
    # dispersion_stats and utilization are one-aggregate operators.
    # Round 6: the fused single-window metrics derivation (sources/
    # transcripts.metrics_from_events) removed the conv_id-keyed lag
    # exchange these groupBys used to piggyback on, so each aggregate
    # now pays its own exchange — but those exchanges carry PARTIAL-AGG
    # output (a few counters per group), not the row stream, and one
    # full window sort of the events disappeared. Budget 3 = events
    # window + two narrow agg exchanges; still joinless.
    for key in ("dispersion_stats", "utilization"):
        plan = _plan(spark, key)
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_ex <= 3, f"{key} plan has {n_ex} exchanges"
        assert "Join" not in plan, key


def test_funnel_and_seasonal_join_backs_never_sortmerge_at_sf(spark):
    # per-conv/per-hod summaries must broadcast at test scale; a
    # SortMergeJoin here means a lost broadcast hint or exploded side
    for key in ("funnel", "seasonal_anomaly"):
        plan = _plan(spark, key)
        assert "SortMergeJoin" not in plan, key
        assert "BroadcastHashJoin" in plan, key


def test_round5_analytics_exchange_budgets(spark):
    # narrow-shuffle budgets for the newest analytics family; a refactor
    # that sneaks in a join-back or loses a shared partitioning fails here
    budgets = {
        "tool_stall": 3,
        "conv_outcomes": 2,
        "conv_dedup": 3,
        "role_mix_daily": 2,
        "weekly_growth": 2,
        "lexical_diversity": 3,
    }
    for key, budget in budgets.items():
        plan = _plan(spark, key)
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_ex <= budget, f"{key}: {n_ex} exchanges > budget {budget}"
        assert "SortMergeJoin" not in plan, key


def test_curation_and_layout_exchange_budgets(spark):
    # repetition_loops: rn window + token distinct + ONE lead() window
    # for intersections (no self-join) + size windows + final agg — all
    # on int digests, text never shuffles. dup_ngram_coverage: one sh_h
    # exchange reused (distinct -> dfreq -> join) + per-doc agg.
    # layout_audit: two global ntile sorts (audit contract) + two aggs +
    # union legs.
    budgets = {
        "repetition_loops": 6,
        # dup_ngram_coverage (round 6): the join-back against the df
        # table is GONE (unique-shingle owners come from min(doc) in
        # the per-shingle aggregate); the (doc, sh_h) distinct subtree
        # is now shared by two static consumers (per-shingle agg,
        # per-doc agg) whose identical exchanges AQE reuses at runtime,
        # and the balance_scan repartition adds one exchange per
        # _aug_docs branch. 9 static nodes, every one narrow (digests
        # or per-doc counters); the fat index never re-shuffles.
        "dup_ngram_coverage": 9,
        "layout_audit": 8,
        # corpus_mix: map-side partial agg -> ONE hash exchange to
        # (lang, source) + ONE single-partition window over that tiny
        # aggregate; the corpus is never re-scanned for totals. +1 in
        # round 6: the balance_scan round-robin exchange that spreads
        # the single-row-group documents scan across the cores.
        "corpus_mix": 3,
        # source_overlap: the (source, digest) collect_set subtree is
        # shared by three static branches (6 Exchange nodes printed)
        # but AQE stage reuse collapses the identical shuffles at
        # runtime — asserted separately below. +1 balance_scan
        # round-robin exchange per branch in round 6 (9 static total).
        "source_overlap": 9,
        # shingle_novelty: ONE collect_set exchange of (digest, day)
        # pairs + ONE per-day agg over the exploded tiny frame
        "shingle_novelty": 2,
        # conv_near_dup: the df-capped (conv, turn_h) index subtree is
        # replicated statically across the self-join sides and the two
        # size branches (each over the aug-union of transcripts); AQE
        # reuses the identical stages at runtime (>=10 ReusedExchange
        # observed) and every exchange carries 8-byte digests
        "conv_near_dup": 35,
        # source_quality: ONE map-side-combining hash agg to |sources|
        # rows; all counting expressions codegen'd in the scan stage
        # (+1 balance_scan exchange in round 6)
        "source_quality": 2,
    }
    for key, budget in budgets.items():
        plan = _plan(spark, key)
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_ex <= budget, f"{key}: {n_ex} exchanges > budget {budget}"
        assert "SortMergeJoin" not in plan, key
    # text bytes must not cross the repetition shuffle: the explode side
    # projects digests before any exchange
    plan = _plan(spark, "repetition_loops")
    assert "term_h" in plan


def test_source_overlap_runtime_exchange_reuse(spark):
    # the per-digest source-set shuffle feeds three consumers (pairs,
    # n_a totals, n_b totals); AQE must materialize it ONCE — a lost
    # reuse means the corpus is scanned and shuffled three times
    df = E.queries()["source_overlap"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert plan.count("ReusedExchange") >= 3, plan.count("ReusedExchange")


def test_sliding_window_expand_single_aggregate(spark):
    # hopping windows must plan as Expand (constant 4-way fan-out inside
    # the aggregate's input projection) + ONE partial/final hash
    # aggregate pair — never a join against a window dimension and never
    # a Generate/explode row blow-up before partial aggregation
    plan = _plan(spark, "sliding_1h15m")
    assert "Expand" in plan
    assert "Generate" not in plan
    assert "Join" not in plan
    # one aggregate exchange on (conv, window) + the metrics lag window
    # exchange on conv — nothing else
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_ex <= 3, f"{n_ex} exchanges"


def test_latency_cube_single_shuffle_grouping_sets(spark):
    # CUBE = Expand over 4 grouping sets + ONE hash aggregate with
    # map-side partial combine; four separate scans/aggregations would
    # show >1 FileScan or >2 post-window exchanges
    plan = _plan(spark, "latency_cube")
    assert "Expand" in plan
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", plan))) == 1
    # the metrics derivation owns 2 window exchanges (turn_idx
    # row_number + latency lag); the cube itself must add exactly ONE
    n_ex = len(set(re.findall(r"\((\d+)\) Exchange", plan)))
    assert n_ex <= 3, f"{n_ex} exchanges"


def test_latency_rollup_hier_single_shuffle(spark):
    # ROLLUP = the same Expand + single hash-aggregate shape as the
    # cube, over 3 grouping sets; one scan, no extra exchange beyond
    # the metrics windows + the one aggregate exchange
    plan = _plan(spark, "latency_rollup_hier")
    assert "Expand" in plan
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", plan))) == 1
    n_ex = len(set(re.findall(r"\((\d+)\) Exchange", plan)))
    assert n_ex <= 3, f"{n_ex} exchanges"


def test_twa_bounded_generate_reuses_conv_partitioning(spark):
    # the LOCF explode is a config-bounded Generate (ceil(tol/width)+1
    # windows per turn), never a join; and because the groupBy keys
    # include conv_id the final aggregate must REUSE the lead-window's
    # conv_id partitioning — turn_idx window + lead window exchanges
    # only, no third exchange for the aggregate
    plan = _plan(spark, "twa_1h")
    assert "Join" not in plan
    assert "Generate" in plan
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_ex <= 2, f"{n_ex} exchanges"


def test_daily_coverage_prunes_latency_window(spark):
    # coverage touches no latency column: Catalyst must prune the lag()
    # window (and its conv exchange) out of the plan entirely, and the
    # events scan must read only (ts, user_id)
    plan = _plan(spark, "daily_coverage")
    assert "lag(" not in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema"
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"ts", "user_id"}, cols
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_ex <= 2, f"{n_ex} exchanges"


def test_pref_pairs_aggregates_not_windows_over_prompts(spark):
    # the chosen/rejected selection must be the struct min/max AGGREGATE
    # (map-side combinable on hot template prompts), never a row_number
    # window over the corpus-wide prompt groups; the only Window is the
    # per-conv lag. Join-free end to end.
    plan = _plan(spark, "pref_pairs")
    assert "Join" not in plan
    # only conv-partitioned Window nodes (the metrics latency lag + the
    # exchange-pairing lag — both ride the SAME conv exchange); never a
    # window partitioned by prompt_digest (a hot template prompt would
    # serialize). Formatted mode repeats node names in detail sections,
    # so count "(n) Window" nodes.
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 2
    for line in plan.splitlines():
        if "partitionBy" in line or "windowspecdefinition" in line.lower():
            assert "prompt_digest" not in line
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) <= 4


def test_template_turns_single_digest_aggregate(spark):
    # one hash-aggregate chain on the 8-byte digest; the text column is
    # hashed in the same project that reads it and never exchanges
    plan = _plan(spark, "template_turns")
    assert "Join" not in plan and "Window" not in plan
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) <= 2
    # no text column in any exchange-side schema line
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line
