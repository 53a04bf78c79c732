"""Incremental, resumable tier maintenance over snapshot batches.

Iceberg stand-in for the sandbox: the input "table" is a directory of
snapshot subdirectories (``snap_00000001/``, ``snap_00000002/``, … each a
parquet dir of new transcript rows — the shape an Iceberg incremental read
between two snapshot ids yields). The engine state is:

  tiers/v{n}/{tier}/       tier tables after snapshot n   (parquet)
  metrics/                 append-only rollup-count + lineage table
  _checkpoint.json         atomically-committed resume token

Cross-snapshot state (the StreamState analogue, /root/reference/libmseed/
libmseed.h:458-465): each version also persists a per-conversation state
table ``(conv_id, last_turn_idx, last_ts_us)`` so the first turn of a
conversation's continuation in the next snapshot gets its true inter-turn
latency — exactly how record N+1's first Steim difference is seeded from
record N's last sample (pack.c:1003-1039). With that carry, the merged
tiers are bit-identical to a full batch recompute over all snapshots
(append-ordered snapshots assumed; out-of-order backfill belongs to a
batch recompute, like the reference's heal pass).

Resume protocol (the fpos analogue, /root/reference/libmseed/
fileutils.c:367-384, recast as snapshot ids per the north rule):

  1. read _checkpoint.json -> last committed version n
  2. for each unprocessed snapshot n+1…: tiers/v{n+1} = merge(tiers/v{n},
     rollup(snapshot n+1)) — written BEFORE the checkpoint advances
  3. append metrics, then atomic-rename the new _checkpoint.json

A crash between (2) and (3) leaves an orphan v{n+1} directory that the
rerun simply overwrites — re-aggregation is deterministic and the merge is
integer-exact-associative (operators/rollup.py contract), so replaying a
snapshot is idempotent. Nothing is double-counted because the merge always
reads the last COMMITTED version, never the orphan.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import TIERS
from ..functions.metrics import derive_turn_metrics
from ..operators.rollup import TIER_AGG_COLS, rollup_from_turns, window_start_col

_SNAP_RE = re.compile(r"^snap_(\d+)$")
_DELTA_RE = re.compile(r"^d(\d+)$")


def list_snapshots(input_dir: str) -> list[tuple[int, str]]:
    out = []
    for name in sorted(os.listdir(input_dir)):
        m = _SNAP_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(input_dir, name)))
    return out


def merge_tier(existing: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Continuous-aggregate MERGE: integer-domain re-aggregation of
    (existing ∪ delta) per (conv_id, window) — exactly associative, so
    merged == full recompute bit-for-bit (tests assert)."""
    src = delta if existing is None else existing.unionByName(delta)
    return (
        src.groupBy("conv_id", "window_start_us", "tier")
        .agg(
            F.sum("n_points").alias("n_points"),
            F.sum("n_latency").alias("n_latency"),
            F.sum("sum_latency_us").alias("sum_latency_us"),
            F.min("min_latency_us").alias("min_latency_us"),
            F.max("max_latency_us").alias("max_latency_us"),
            F.sum("sum_tokens").alias("sum_tokens"),
            F.min("min_ts_us").alias("min_ts_us"),
            F.max("max_ts_us").alias("max_ts_us"),
        )
        .select("conv_id", "window_start_us", *TIER_AGG_COLS, "tier")
    )


class IncrementalRollup:
    """Resumable snapshot-by-snapshot tier maintenance with lineage.

    Maintains BOTH tier families incrementally:

      * aggregate tiers — integer-exact merge per (conv_id, window)
        (merge_tier above)
      * packed payload tiers (``pack_tiers``) — per snapshot, ONLY the
        windows the delta touches are re-encoded (windows are
        self-delimiting, so untouched blobs are reusable as-is — the
        reference's incremental record emission,
        /root/reference/libmseed/pack.c:70-395). Re-encoding a touched
        window decodes its previous blob, restores each old point's
        turn_idx from the conversation's cumulative window point counts
        (metadata only — no other window is decoded), unions the delta
        points, and packs. The result is byte-identical to a full batch
        pack_tier over all snapshots (tests assert).

        Each snapshot writes only the re-encoded windows to
        ``packed/{tier}/d{version}/`` — a MERGE-on-read delta chain, the
        parquet standin for an Iceberg MERGE (no Iceberg jars in this
        sandbox); packed_tier() resolves latest-version-per-window at
        read. At 100 TB this keeps per-snapshot write volume proportional
        to the delta, not the table.

        Preconditions (same contract as repack_tier and the conv-state
        carry): append-ordered snapshots, dense per-conversation turn_idx
        from 0, ts monotone w.r.t. turn_idx. Out-of-order backfill
        belongs to a batch recompute, like the reference's heal pass.
    """

    def __init__(
        self,
        spark: SparkSession,
        input_dir: str,
        work_dir: str,
        pack_tiers: tuple[str, ...] = ("1m",),
    ):
        self.spark = spark
        self.input_dir = input_dir
        self.work_dir = work_dir
        self.pack_tiers = tuple(pack_tiers)
        os.makedirs(work_dir, exist_ok=True)
        self.ckpt_path = os.path.join(work_dir, "_checkpoint.json")

    # -- state ----------------------------------------------------------
    def _read_ckpt(self) -> dict:
        if not os.path.exists(self.ckpt_path):
            return {"version": 0, "run_id": str(uuid.uuid4())}
        with open(self.ckpt_path) as f:
            return json.load(f)

    def _commit_ckpt(self, state: dict) -> None:
        tmp = self.ckpt_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.ckpt_path)  # atomic commit

    def _tier_path(self, version: int, tier: str) -> str:
        return os.path.join(self.work_dir, "tiers", f"v{version:08d}", tier)

    def _state_path(self, version: int) -> str:
        return os.path.join(self.work_dir, "tiers", f"v{version:08d}", "_convstate")

    def conv_state(self, version: int) -> DataFrame | None:
        if version == 0:
            return None
        return self.spark.read.parquet(self._state_path(version))

    def tier(self, tier: str, version: int | None = None) -> DataFrame | None:
        v = version if version is not None else self._read_ckpt()["version"]
        if v == 0:
            return None
        return self.spark.read.parquet(self._tier_path(v, tier))

    def _packed_delta_path(self, version: int, tier: str) -> str:
        return os.path.join(self.work_dir, "packed", tier, f"d{version:08d}")

    def packed_tier(self, tier: str, version: int | None = None) -> DataFrame | None:
        """Packed tier table at a version: MERGE-on-read over the delta
        chain — union every committed delta dir and keep the
        latest-version row per (conv_id, window). One shuffle on the
        window key at read; an Iceberg MERGE would resolve this with
        positional deletes instead (sandbox standin, see class doc)."""
        v = version if version is not None else self._read_ckpt()["version"]
        base = os.path.join(self.work_dir, "packed", tier)
        if not os.path.isdir(base):
            return None
        deltas = []
        for name in sorted(os.listdir(base)):
            m = _DELTA_RE.match(name)
            if m and int(m.group(1)) <= v:
                deltas.append((int(m.group(1)), os.path.join(base, name)))
        if not deltas:
            return None
        parts = [
            self.spark.read.parquet(p).withColumn("_v", F.lit(i))
            for i, p in deltas
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        w = Window.partitionBy("conv_id", "window_start_us").orderBy(F.desc("_v"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_v", "_rn")
        )

    def metrics_table(self) -> DataFrame | None:
        p = os.path.join(self.work_dir, "metrics")
        if not os.path.isdir(p):
            return None
        snaps = [n for n in os.listdir(p) if n.startswith("snap_")]
        if not snaps:  # empty dir or stray non-snapshot files
            return None
        return self.spark.read.parquet(os.path.join(p, "snap_*"))

    # -- processing -----------------------------------------------------
    def process_pending(self) -> int:
        """Roll every unprocessed snapshot into the tier tables; returns
        the number of snapshots processed. Safe to call after a crash."""
        state = self._read_ckpt()
        done = 0
        for snap_id, snap_path in list_snapshots(self.input_dir):
            if snap_id <= state["version"]:
                continue
            self._process_one(state, snap_id, snap_path)
            state["version"] = snap_id
            self._commit_ckpt(state)
            done += 1
        return done

    def _process_one(self, state: dict, snap_id: int, snap_path: str) -> None:
        t0 = time.time()
        raw = self.spark.read.parquet(snap_path)
        delta_m = derive_turn_metrics(raw)
        prev_version = state["version"]

        # StreamState carry: seed each conversation's first-in-snapshot
        # latency from the previous snapshot's last turn
        prev_state = self.conv_state(prev_version)
        if prev_state is not None:
            delta_m = delta_m.join(prev_state, "conv_id", "left").withColumn(
                "latency_us",
                F.coalesce(
                    F.col("latency_us"), F.col("ts_us") - F.col("last_ts_us")
                ),
            ).drop("last_turn_idx", "last_ts_us")

        # advance the state: last (turn_idx, ts) per conversation
        delta_last = delta_m.groupBy("conv_id").agg(
            F.max(F.struct("turn_idx", "ts_us")).alias("_last")
        )
        src = delta_last if prev_state is None else delta_last.unionByName(
            prev_state.select(
                "conv_id",
                F.struct(
                    F.col("last_turn_idx").alias("turn_idx"),
                    F.col("last_ts_us").alias("ts_us"),
                ).alias("_last"),
            )
        )
        new_state = src.groupBy("conv_id").agg(F.max("_last").alias("_last")).select(
            "conv_id",
            F.col("_last.turn_idx").alias("last_turn_idx"),
            F.col("_last.ts_us").alias("last_ts_us"),
        )
        new_state.write.mode("overwrite").parquet(self._state_path(snap_id))
        lineage_files = sorted(
            f for f in os.listdir(snap_path) if f.endswith(".parquet")
        )
        metric_rows = []
        for tier in TIERS:
            delta = rollup_from_turns(delta_m, tier)
            merged = merge_tier(self.tier(tier, prev_version), delta)
            out = self._tier_path(snap_id, tier)
            merged.write.mode("overwrite").parquet(out)
            stats = self.spark.read.parquet(out).agg(
                F.count(F.lit(1)).alias("n_windows"),
                F.sum("n_points").alias("n_points"),
            ).collect()[0]
            metric_rows.append(
                (
                    state["run_id"],
                    snap_id,
                    tier,
                    int(stats["n_windows"]),
                    int(stats["n_points"]),
                    ",".join(lineage_files),
                    float(time.time() - t0),
                )
            )
        metrics_df = self.spark.createDataFrame(
            metric_rows,
            "run_id string, snapshot_id int, tier string, n_windows long,"
            " n_points long, lineage string, wall_s double",
        )
        # keyed-by-snapshot OVERWRITE, not a blind append: a crash between
        # this write and the checkpoint commit makes the rerun rewrite the
        # same directory instead of double-appending the snapshot's rows —
        # metrics share the tier tables' replay-idempotence guarantee
        metrics_df.write.mode("overwrite").parquet(
            os.path.join(self.work_dir, "metrics", f"snap_{snap_id:08d}")
        )
        for tier in self.pack_tiers:
            self._update_packed(prev_version, snap_id, delta_m, tier)

    def _update_packed(
        self, prev_version: int, snap_id: int, delta_m: DataFrame, tier: str
    ) -> None:
        """Re-encode only the windows the delta touches (class doc)."""
        from ..operators.pack import pack_tier, unpack_tier

        pt_cols = ["conv_id", "turn_idx", "ts_us", "latency_us", "token_count"]
        delta_pts = delta_m.select(
            "conv_id",
            F.col("turn_idx").cast("long").alias("turn_idx"),
            "ts_us",
            F.col("latency_us").cast("double").alias("latency_us"),
            F.col("token_count").cast("double").alias("token_count"),
        )
        prev = self.packed_tier(tier, prev_version)
        if prev is None:
            pts = delta_pts
        else:
            touched = delta_pts.select(
                "conv_id",
                window_start_col(F.col("ts_us"), tier).alias("window_start_us"),
            ).distinct()
            # all windows of the touched conversations: needed to restore
            # old points' turn_idx from cumulative n_points — a metadata
            # scan; only the touched windows' payloads are decoded
            prev_conv = prev.join(
                touched.select("conv_id").distinct(), "conv_id", "left_semi"
            )
            woff = (
                Window.partitionBy("conv_id")
                .orderBy("window_start_us")
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            offsets = prev_conv.select(
                "conv_id",
                "window_start_us",
                F.coalesce(F.sum("n_points").over(woff), F.lit(0)).alias("_off"),
            )
            old_touched = prev_conv.join(
                touched, ["conv_id", "window_start_us"], "left_semi"
            )
            old_pts = (
                unpack_tier(old_touched, with_pos=True)
                .join(offsets, ["conv_id", "window_start_us"])
                .select(
                    "conv_id",
                    (F.col("_off") + F.col("pos")).alias("turn_idx"),
                    "ts_us",
                    F.col("latency_us_f").alias("latency_us"),
                    F.col("token_count_f").alias("token_count"),
                )
            )
            pts = old_pts.unionByName(delta_pts.select(*pt_cols))
        pack_tier(pts, tier).write.mode("overwrite").parquet(
            self._packed_delta_path(snap_id, tier)
        )
