"""Incremental snapshot pipeline: resume, idempotence, state carry, lineage.

Mirrors the reference's resumable scan position (fpos, fileutils.c:367-384)
and cross-record StreamState (libmseed.h:458-465) at snapshot granularity.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from sac2mseed_spark.functions.metrics import derive_turn_metrics
from sac2mseed_spark.operators.rollup import rollup_from_turns
from sac2mseed_spark.plans.pipeline import IncrementalRollup, list_snapshots
from sac2mseed_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def snapshots(spark, tmp_path_factory):
    """Split t_small into 3 append-ordered snapshots by turn ranges."""
    base = tmp_path_factory.mktemp("snaps")
    t = generate_transcripts(spark, "t_small", seed=42)
    bounds = [(0, 20), (20, 60), (60, 10_000)]
    for i, (lo, hi) in enumerate(bounds, start=1):
        part = t.filter((F.col("turn_idx") >= lo) & (F.col("turn_idx") < hi))
        part.write.mode("overwrite").parquet(str(base / f"snap_{i:08d}"))
    return str(base), t


def _tiers_as_dict(df):
    return {
        (r["conv_id"], r["window_start_us"], r["tier"]): (
            r["n_points"], r["n_latency"], r["sum_latency_us"],
            r["min_latency_us"], r["max_latency_us"], r["sum_tokens"],
            r["min_ts_us"], r["max_ts_us"],
        )
        for r in df.collect()
    }


def test_incremental_equals_full_recompute(spark, snapshots, tmp_path):
    src, full_t = snapshots
    inc = IncrementalRollup(spark, src, str(tmp_path / "work"))
    n = inc.process_pending()
    assert n == 3
    full_m = derive_turn_metrics(full_t)
    for tier in ("1m", "1h", "1d"):
        got = _tiers_as_dict(inc.tier(tier))
        want = _tiers_as_dict(rollup_from_turns(full_m, tier))
        assert got == want, f"tier {tier} diverges from batch recompute"


def test_resume_after_partial_failure(spark, snapshots, tmp_path):
    """Kill between tier write and checkpoint commit -> rerun must not
    double-count (orphan version is overwritten)."""
    src, full_t = snapshots
    work = str(tmp_path / "work2")
    inc = IncrementalRollup(spark, src, work)

    state = inc._read_ckpt()
    snaps = list_snapshots(src)
    # process snapshot 1 fully
    inc._process_one(state, *snaps[0])
    state["version"] = snaps[0][0]
    inc._commit_ckpt(state)
    # process snapshot 2 but CRASH before the checkpoint commit
    inc._process_one(state, *snaps[1])
    # resume: snapshot 2 reprocessed (overwrite), snapshot 3 processed
    assert inc.process_pending() == 2
    full_m = derive_turn_metrics(full_t)
    got = _tiers_as_dict(inc.tier("1h"))
    want = _tiers_as_dict(rollup_from_turns(full_m, "1h"))
    assert got == want
    # metrics are replay-idempotent too: exactly one row per
    # (snapshot, tier) even though snapshot 2 ran twice
    mrows = inc.metrics_table().collect()
    keys = [(r["snapshot_id"], r["tier"]) for r in mrows]
    assert len(keys) == len(set(keys)) == 9


def test_noop_when_caught_up(spark, snapshots, tmp_path):
    src, _ = snapshots
    work = str(tmp_path / "work3")
    inc = IncrementalRollup(spark, src, work)
    assert inc.process_pending() == 3
    assert inc.process_pending() == 0


def test_metrics_lineage(spark, snapshots, tmp_path):
    src, full_t = snapshots
    work = str(tmp_path / "work4")
    inc = IncrementalRollup(spark, src, work)
    inc.process_pending()
    mt = inc.metrics_table()
    rows = mt.collect()
    # 3 snapshots x 3 tiers
    assert len(rows) == 9
    assert all(r["lineage"] for r in rows)
    assert {r["snapshot_id"] for r in rows} == {1, 2, 3}
    # final cumulative n_points per tier == total turns
    n_turns = full_t.count()
    last = {r["tier"]: r["n_points"] for r in rows if r["snapshot_id"] == 3}
    assert set(last.values()) == {n_turns}
    # running totals (maintained arithmetically from delta-sized stats,
    # never an O(table) rescan) match a direct scan at EVERY version
    for snap_id in (1, 2, 3):
        per_tier = {
            r["tier"]: r for r in rows if r["snapshot_id"] == snap_id
        }
        for tier in ("1m", "1h", "1d"):
            direct = inc.tier(tier, version=snap_id).agg(
                F.count(F.lit(1)).alias("w"),
                F.sum("n_points").alias("p"),
            ).collect()[0]
            assert per_tier[tier]["n_windows"] == direct["w"]
            assert per_tier[tier]["n_points"] == direct["p"]
    # checkpoint file records version 3
    with open(os.path.join(work, "_checkpoint.json")) as f:
        assert json.load(f)["version"] == 3


def test_chain_reads_are_touched_pruned(spark, snapshots, tmp_path):
    """Guard the delta-sized-merge claim: every chain read issued while
    processing a snapshot passes a ``touched`` key set, and the rows it
    actually returns are bounded by that key set — NOT by the table size
    (plans/pipeline._resolve_chain semi-join). Regressing to a full-chain
    merge would break the per-snapshot-cost-is-delta-proportional design
    (VERDICT r4 task 7)."""
    src, full_t = snapshots
    work = str(tmp_path / "work_prune")
    inc = IncrementalRollup(spark, src, work)

    # catch up through snapshot 2; spy on snapshot 3's chain reads
    state = inc._read_ckpt()
    snaps = list_snapshots(src)
    for sid, path in snaps[:2]:
        inc._process_one(state, sid, path)
        state["version"] = sid
        inc._commit_ckpt(state)

    calls = []
    orig = IncrementalRollup._resolve_chain

    def spy(self, base, version, keys, touched=None, bound_us=None,
            healed_through=None, touched_on=None):
        calls.append({"base": base, "version": version, "keys": keys,
                      "touched": touched, "touched_on": touched_on})
        return orig(self, base, version, keys, touched=touched,
                    bound_us=bound_us, healed_through=healed_through,
                    touched_on=touched_on)

    IncrementalRollup._resolve_chain = spy
    try:
        inc._process_one(state, *snaps[2])
    finally:
        IncrementalRollup._resolve_chain = orig

    assert calls, "no chain reads spied"
    window_checked = conv_checked = 0
    for c in calls:
        # EVERY chain read issued while processing a snapshot is pruned —
        # tier merges by touched window, packed re-encode and conv-state
        # by touched conversation. A None here is a regression to a
        # full-table merge.
        assert c["touched"] is not None, f"un-pruned chain read: {c['base']}"
        n_touched = c["touched"].distinct().count()
        full = orig(inc, c["base"], c["version"], c["keys"])
        got = orig(inc, c["base"], c["version"], c["keys"],
                   touched=c["touched"], touched_on=c["touched_on"])
        n_full = full.count() if full is not None else 0
        n_got = got.count() if got is not None else 0
        if (c["touched_on"] or c["keys"]) == c["keys"]:
            # window-keyed prune: the merge read is bounded by |touched|,
            # and snapshot 3 (turns >= 60) touches a strict subset of the
            # 1m windows so pruning must actually bite
            assert n_got <= n_touched, (c["base"], n_got, n_touched)
            if "1m" in c["base"]:
                assert n_got < n_full, "semi-join did not prune any rows"
                window_checked += 1
        else:
            # conv-keyed prune (packed path): bounded by the touched
            # conversations' windows — strictly fewer rows than the
            # chain holds (snapshot 3 touches only the >60-turn convs)
            assert n_got < n_full, (c["base"], n_got, n_full)
            conv_checked += 1
    assert window_checked >= 1 and conv_checked >= 1
