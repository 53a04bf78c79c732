"""Heal/backfill: out-of-order snapshots repaired to batch-recompute parity.

The mst_groupheal analogue (/root/reference/libmseed/traceutils.c:776-915;
out-of-order insertion tracelist.c:392-556): an out-of-order snapshot is
detected per conversation at process time, rolled in provisionally, and
``heal()`` re-derives ONLY the affected conversations from all raw
snapshots, writing corrective chain entries — after which aggregate AND
packed tiers are byte-identical to a full batch recompute, and incremental
mode resumes.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from sac2mseed_spark.functions.metrics import derive_turn_metrics
from sac2mseed_spark.operators.pack import pack_tier
from sac2mseed_spark.operators.rollup import rollup_from_turns
from sac2mseed_spark.plans.pipeline import IncrementalRollup
from sac2mseed_spark.sources.transcripts import generate_transcripts

# snapshot 3 arrives LATE: turns [20, 40) land after turns [40, 60)
OOO_BOUNDS = [(0, 20), (40, 60), (20, 40), (60, 10_000)]


@pytest.fixture(scope="module")
def ooo_snapshots(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("healsnaps")
    t = generate_transcripts(spark, "t_small", seed=42)
    for i, (lo, hi) in enumerate(OOO_BOUNDS, start=1):
        part = t.filter((F.col("turn_idx") >= lo) & (F.col("turn_idx") < hi))
        part.write.mode("overwrite").parquet(str(base / f"snap_{i:08d}"))
    return str(base), t


def _agg_as_dict(df):
    return {
        (r["conv_id"], r["window_start_us"], r["tier"]): (
            r["n_points"], r["n_latency"], r["sum_latency_us"],
            r["min_latency_us"], r["max_latency_us"], r["sum_tokens"],
            r["min_ts_us"], r["max_ts_us"],
        )
        for r in df.collect()
    }


def _packed_as_dict(df):
    return {
        (r["conv_id"], r["window_start_us"]): (
            r["n_points"], r["n_chunks"], r["first_ts_us"], r["last_ts_us"],
            r["x0"], r["xn"], bytes(r["payload"]), r["crc32"],
        )
        for r in df.collect()
    }


def _turns_upto(t, snap_idx):
    """Union of OOO_BOUNDS[:snap_idx] turn ranges (what's been ingested)."""
    cond = F.lit(False)
    for lo, hi in OOO_BOUNDS[:snap_idx]:
        cond = cond | ((F.col("turn_idx") >= lo) & (F.col("turn_idx") < hi))
    return t.filter(cond)


def test_ooo_detected_then_heal_restores_batch_parity(
    spark, ooo_snapshots, tmp_path
):
    src, full_t = ooo_snapshots
    inc = IncrementalRollup(spark, src, str(tmp_path / "w"), pack_tiers=("1m",))
    assert inc.process_pending() == 4

    # the late snapshot flagged its conversations for heal
    pend = os.path.join(str(tmp_path / "w"), "heal_pending", "d00000003")
    assert os.path.isdir(pend)
    flagged = {r["conv_id"] for r in spark.read.parquet(pend).collect()}
    # every conversation with >= 41 turns saw turns [20,40) arrive after
    # turns [40,60) — exactly those are affected
    n_per_conv = {
        r["conv_id"]: r["n"]
        for r in full_t.groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    assert flagged == {c for c, n in n_per_conv.items() if n > 40}

    healed = inc.heal()
    assert healed == len(flagged)

    full_m = derive_turn_metrics(full_t)
    for tier in ("1m", "1h", "1d"):
        got = _agg_as_dict(inc.tier(tier))
        want = _agg_as_dict(rollup_from_turns(full_m, tier))
        assert got == want, f"tier {tier} diverges from batch recompute"
    got_p = _packed_as_dict(inc.packed_tier("1m"))
    want_p = _packed_as_dict(pack_tier(full_m, "1m"))
    assert got_p == want_p, "packed tier not byte-identical after heal"

    # heal is a no-op the second time (watermark advanced)
    assert inc.heal() == 0


def test_incremental_resumes_after_heal(spark, ooo_snapshots, tmp_path):
    """Heal mid-stream (after the OOO snapshot, before the last one), then
    keep ingesting — the chain must stay at batch parity."""
    src, full_t = ooo_snapshots
    work = str(tmp_path / "w2")
    # stage only the first three snapshots, heal, then deliver the fourth
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    for i in (1, 2, 3):
        shutil.copytree(
            os.path.join(src, f"snap_{i:08d}"),
            os.path.join(staged, f"snap_{i:08d}"),
        )
    inc = IncrementalRollup(spark, staged, work, pack_tiers=("1m",))
    assert inc.process_pending() == 3
    assert inc.heal() > 0
    m3 = derive_turn_metrics(_turns_upto(full_t, 3))
    assert _agg_as_dict(inc.tier("1h")) == _agg_as_dict(
        rollup_from_turns(m3, "1h")
    )
    assert _packed_as_dict(inc.packed_tier("1m")) == _packed_as_dict(
        pack_tier(m3, "1m")
    )

    shutil.copytree(
        os.path.join(src, "snap_00000004"),
        os.path.join(staged, "snap_00000004"),
    )
    assert inc.process_pending() == 1
    full_m = derive_turn_metrics(full_t)
    for tier in ("1m", "1h", "1d"):
        assert _agg_as_dict(inc.tier(tier)) == _agg_as_dict(
            rollup_from_turns(full_m, tier)
        ), f"tier {tier} diverges after post-heal ingest"
    assert _packed_as_dict(inc.packed_tier("1m")) == _packed_as_dict(
        pack_tier(full_m, "1m")
    )


def test_heal_crash_replay(spark, ooo_snapshots, tmp_path):
    """Crash mid-heal (some heal dirs written, watermark NOT advanced):
    the rerun rewrites everything deterministically."""
    src, full_t = ooo_snapshots
    work = str(tmp_path / "w3")
    inc = IncrementalRollup(spark, src, work, pack_tiers=("1m",))
    inc.process_pending()

    # simulate the crash: run a full heal, then roll back the watermark,
    # delete one family's heal dir, and restore the pending dirs heal
    # consumed — exactly the on-disk state of a process killed between
    # the aggregate writes and the commit (pending deletion happens only
    # AFTER the commit, so a pre-commit crash still has the flags)
    pend = os.path.join(work, "heal_pending")
    pend_copy = str(tmp_path / "pend_copy")
    shutil.copytree(pend, pend_copy)
    state_before = inc._read_ckpt()
    assert inc.heal() > 0
    state_after = inc._read_ckpt()
    assert state_after["healed_through"] == 4
    shutil.rmtree(os.path.join(work, "packed", "1m", "d00000004h"))
    shutil.rmtree(pend, ignore_errors=True)
    shutil.copytree(pend_copy, pend)
    state_after["healed_through"] = state_before["healed_through"]
    inc._commit_ckpt(state_after)

    assert inc.heal() > 0  # replays clean
    full_m = derive_turn_metrics(full_t)
    assert _agg_as_dict(inc.tier("1d")) == _agg_as_dict(
        rollup_from_turns(full_m, "1d")
    )
    assert _packed_as_dict(inc.packed_tier("1m")) == _packed_as_dict(
        pack_tier(full_m, "1m")
    )
