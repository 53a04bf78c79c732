"""Incremental, resumable tier maintenance over snapshot batches.

Iceberg stand-in for the sandbox: the input "table" is a directory of
snapshot subdirectories (``snap_00000001/``, ``snap_00000002/``, … each a
parquet dir of new transcript rows — the shape an Iceberg incremental read
between two snapshot ids yields). The engine state is:

  tiers/{tier}/d{n}[h]/    MERGE-on-read delta chain per aggregate tier
  tiers/_convstate/d{n}/   per-conversation carry state, same chain form
  packed/{tier}/d{n}[h]/   packed-payload delta chain
  metrics/                 append-only rollup-count + lineage table
  retention/               eviction-sweep accounting table
  heal_pending/d{n}/       conversations flagged out-of-order at snapshot n
  _checkpoint.json         atomically-committed resume token

EVERY table family is a delta chain: snapshot n writes ONLY the rows its
delta touches to a ``d{n}`` directory, and reads resolve
latest-version-wins per key (aggregate tiers and packed tiers key on
(conv_id, window_start_us); conv state keys on conv_id). Per-snapshot
write volume is therefore proportional to the delta, not the table — the
reference merges into only the touched trace the same way
(/root/reference/libmseed/tracelist.c:135-606 fast paths), and an Iceberg
deployment expresses the same chain as MERGE + positional deletes (no
Iceberg jars in this sandbox, so parquet dirs + this resolver stand in).
``compact()`` is the rewrite_data_files analogue that folds a long chain
back into one base directory.

Cross-snapshot state (the StreamState analogue, /root/reference/libmseed/
libmseed.h:458-465): each snapshot also writes the touched conversations'
new ``(conv_id, last_turn_idx, last_ts_us)`` so the first turn of a
conversation's continuation in the next snapshot gets its true inter-turn
latency — exactly how record N+1's first Steim difference is seeded from
record N's last sample (pack.c:1003-1039). With that carry, the merged
tiers are bit-identical to a full batch recompute over all snapshots for
append-ordered input (tests assert).

Out-of-order input and the heal pass (the mst_groupheal analogue,
/root/reference/src/../libmseed/traceutils.c:776-915): a snapshot whose
minimum turn_idx for a conversation is <= the carried last_turn_idx is
out-of-order — its within-snapshot latencies were derived against the
wrong predecessor. ``_process_one`` still rolls it in (the aggregate
merge is order-insensitive in structure, only the affected latency VALUES
are provisional) and records the affected conv_ids under
``heal_pending/``. ``heal()`` then re-derives ONLY those conversations
from all raw snapshots and writes corrective ``d{n}h`` chain entries
(ranked after ``d{n}``) for every table family — after which all tiers
are byte-identical to a full recompute (tests assert), and incremental
processing resumes unchanged.

Retention (downsample-and-expire): ``apply_retention`` commits per-tier
eviction BOUNDS into the checkpoint — eviction is a pure predicate on
window_start_us applied by every chain read, i.e. the metadata-only
``DELETE WHERE window_start_us < bound`` of operators/retention.py, with
the sweep accounting row written to ``retention/``. No data files are
touched until ``compact()`` reclaims the space physically.

Resume protocol (the fpos analogue, /root/reference/libmseed/
fileutils.c:367-384, recast as snapshot ids per the north rule):

  1. read _checkpoint.json -> last committed version n
  2. for snapshot n+1: write the d{n+1} delta dirs of every family —
     BEFORE the checkpoint advances
  3. append metrics, then atomic-rename the new _checkpoint.json

A crash between (2) and (3) leaves orphan d{n+1} directories that the
rerun simply overwrites — re-aggregation is deterministic and the merge
is integer-exact-associative (operators/rollup.py contract), so replaying
a snapshot is idempotent: the chain resolver never reads past the
committed version, so nothing is double-counted. Rollup-count totals in
the metrics table are maintained ARITHMETICALLY (previous committed
totals + delta-sized aggregates, crash-safe inside the same checkpoint),
never by re-scanning the table.

Reads never see uncommitted data — every structural transition is gated
by the atomically-swapped checkpoint:

  * snapshot deltas: invisible until ``version`` advances (above);
  * heal entries ``d{v}h``: invisible until ``healed_through`` >= v
    (_chain_dirs gate; crash debris above the watermark is GC'd by the
    next heal()/compact() so it can never be resurrected);
  * compaction: two-phase — stage under ``_compact_tmp`` (a name the
    chain regex never matches), commit ``compact_intent``, swap, clear.
    A crash mid-swap is finished by ``_maybe_recover()`` on the next
    entry point, reads included, so a half-swapped chain is never served.

``compact()`` runs automatically when any family's chain exceeds
``max_chain`` entries (ctor policy) — bounding the per-read latest-wins
resolve at O(max_chain) deltas — and remains callable as an explicit
maintenance action.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import TIERS
from ..functions.metrics import derive_turn_metrics
from ..operators.retention import retention_bound_us, retention_sweep
from ..operators.rollup import TIER_AGG_COLS, rollup_from_turns, window_start_col

_SNAP_RE = re.compile(r"^snap_(\d+)$")
# d{version}[h]: plain snapshot deltas rank before the heal delta of the
# same version ('' < 'h' lexicographically — latest-wins reads pick heal)
_DELTA_RE = re.compile(r"^d(\d+)(h?)$")

_WINDOW_KEYS = ["conv_id", "window_start_us"]


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
    merged == full recompute bit-for-bit (tests assert). Callers pass
    only the TOUCHED windows of ``existing`` (a semi-join on the delta's
    keys), keeping this merge delta-sized."""
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

    Maintains aggregate tiers, packed payload tiers, and conversation
    carry state as MERGE-on-read delta chains (module doc). Packed-tier
    snapshots re-encode ONLY the windows the delta touches (windows are
    self-delimiting, so untouched blobs are reusable as-is — the
    reference's incremental record emission,
    /root/reference/libmseed/pack.c:70-395): re-encoding a touched window
    decodes its previous blob, restores each old point's turn_idx from
    the conversation's cumulative window point counts (metadata only —
    no other window is decoded), unions the delta points, and packs.
    The result is byte-identical to a full batch pack_tier over all
    snapshots (tests assert).

    Preconditions for the incremental fast path: append-ordered
    snapshots, dense per-conversation turn_idx from 0, ts monotone
    w.r.t. turn_idx. Out-of-order input is detected per conversation and
    repaired by ``heal()`` (module doc) rather than silently corrupting
    the fast path.
    """

    def __init__(
        self,
        spark: SparkSession,
        input_dir: str,
        work_dir: str,
        pack_tiers: tuple[str, ...] = ("1m",),
        max_chain: int | None = 8,
    ):
        self.spark = spark
        self.input_dir = input_dir
        self.work_dir = work_dir
        self.pack_tiers = tuple(pack_tiers)
        # auto-compaction policy: after a snapshot commit, if any family's
        # chain exceeds this many entries, compact() runs inline (None
        # disables). Bounds the chain-length-proportional row_number
        # shuffle every MERGE-on-read pays — without it, hourly snapshots
        # grow ~720 dirs/family/month between manual maintenance windows.
        self.max_chain = max_chain
        os.makedirs(work_dir, exist_ok=True)
        self.ckpt_path = os.path.join(work_dir, "_checkpoint.json")

    # -- checkpoint -----------------------------------------------------
    def _read_ckpt(self) -> dict:
        if not os.path.exists(self.ckpt_path):
            return {
                "version": 0,
                "run_id": str(uuid.uuid4()),
                "totals": {},
                "healed_through": 0,
                "retention_bounds": {},
            }
        with open(self.ckpt_path) as f:
            state = json.load(f)
        state.setdefault("totals", {})
        state.setdefault("healed_through", 0)
        state.setdefault("retention_bounds", {})
        return state

    def _commit_ckpt(self, state: dict) -> None:
        tmp = self.ckpt_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.ckpt_path)  # atomic commit

    # -- chain layout ---------------------------------------------------
    def _tier_base(self, tier: str) -> str:
        return os.path.join(self.work_dir, "tiers", tier)

    def _state_base(self) -> str:
        return os.path.join(self.work_dir, "tiers", "_convstate")

    def _packed_base(self, tier: str) -> str:
        return os.path.join(self.work_dir, "packed", tier)

    def _pending_base(self) -> str:
        return os.path.join(self.work_dir, "heal_pending")

    def _delta_path(self, base: str, version: int, heal: bool = False) -> str:
        return os.path.join(base, f"d{version:08d}" + ("h" if heal else ""))

    def _packed_delta_path(self, version: int, tier: str) -> str:
        return self._delta_path(self._packed_base(tier), version)

    def _chain_dirs(
        self, base: str, version: int, healed_through: int | None = None
    ) -> list[str]:
        """Committed chain entries <= version, in resolution order
        (ascending version; a heal entry ranks after its plain twin).

        A heal entry ``d{v}h`` is included only once the checkpoint's
        ``healed_through`` watermark has reached v: heal() writes its dirs
        BEFORE committing that watermark, so a crash mid-heal leaves the
        partial dirs invisible to every read (no torn reads — the module
        doc's reads-never-see-uncommitted-data invariant). Orphans from a
        crashed heal are garbage-collected by the next heal()/compact()
        before the watermark can advance past them."""
        if healed_through is None:
            healed_through = self._read_ckpt()["healed_through"]
        if not os.path.isdir(base):
            return []
        entries = []
        for name in os.listdir(base):
            m = _DELTA_RE.match(name)
            if not m or int(m.group(1)) > version:
                continue
            if m.group(2) and int(m.group(1)) > healed_through:
                continue  # uncommitted heal entry (crash debris)
            entries.append((int(m.group(1)), m.group(2), name))
        return [os.path.join(base, n) for _, _, n in sorted(entries)]

    def _resolve_chain(
        self,
        base: str,
        version: int,
        keys: list[str],
        touched: DataFrame | None = None,
        bound_us: int | None = None,
        healed_through: int | None = None,
        touched_on: list[str] | None = None,
    ) -> DataFrame | None:
        """MERGE-on-read: union the chain <= version, latest-version-wins
        per key. ``touched`` (a DataFrame of ``touched_on`` columns,
        default ``keys``) semi-joins each chain entry down to the rows a
        merge needs — with parquet row-group min/max stats this prunes
        most of each delta file; Iceberg would prune at manifest level.
        ``touched_on`` may be a key prefix (e.g. just conv_id when the
        caller needs every window of the touched conversations — the
        packed re-encode path). ``bound_us`` applies the committed
        retention predicate (metadata-only DELETE, module doc)."""
        dirs = self._chain_dirs(base, version, healed_through)
        if not dirs:
            return None
        parts = []
        for i, path in enumerate(dirs):
            df = self.spark.read.parquet(path)
            if touched is not None:
                df = df.join(touched, touched_on or keys, "left_semi")
            parts.append(df.withColumn("_v", F.lit(i)))
        df = reduce(DataFrame.unionByName, parts)
        if bound_us is not None:
            df = df.filter(F.col("window_start_us") >= F.lit(bound_us))
        w = Window.partitionBy(*keys).orderBy(F.desc("_v"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_v", "_rn")
        )

    # -- readers --------------------------------------------------------
    def conv_state(self, version: int) -> DataFrame | None:
        if version == 0:
            return None
        self._maybe_recover(self._read_ckpt())
        return self._resolve_chain(self._state_base(), version, ["conv_id"])

    def tier(self, tier: str, version: int | None = None) -> DataFrame | None:
        state = self._maybe_recover(self._read_ckpt())
        v = version if version is not None else state["version"]
        if v == 0:
            return None
        return self._resolve_chain(
            self._tier_base(tier),
            v,
            _WINDOW_KEYS,
            bound_us=state["retention_bounds"].get(tier),
        )

    def packed_tier(self, tier: str, version: int | None = None) -> DataFrame | None:
        state = self._maybe_recover(self._read_ckpt())
        v = version if version is not None else state["version"]
        if v == 0:
            return None
        return self._resolve_chain(
            self._packed_base(tier),
            v,
            _WINDOW_KEYS,
            bound_us=state["retention_bounds"].get(tier),
        )

    def metrics_table(self) -> DataFrame | None:
        p = os.path.join(self.work_dir, "metrics")
        if not os.path.isdir(p):
            return None
        snaps = [n for n in os.listdir(p) if n.startswith("snap_")]
        if not snaps:  # empty dir or stray non-snapshot files
            return None
        return self.spark.read.parquet(os.path.join(p, "snap_*"))

    def retention_table(self) -> DataFrame | None:
        p = os.path.join(self.work_dir, "retention")
        if not os.path.isdir(p) or not os.listdir(p):
            return None
        return self.spark.read.parquet(os.path.join(p, "sweep_*"))

    # -- processing -----------------------------------------------------
    def process_pending(self) -> int:
        """Roll every unprocessed snapshot into the tier tables; returns
        the number of snapshots processed. Safe to call after a crash."""
        state = self._maybe_recover(self._read_ckpt())
        done = 0
        for snap_id, snap_path in list_snapshots(self.input_dir):
            if snap_id <= state["version"]:
                continue
            self._process_one(state, snap_id, snap_path)
            state["version"] = snap_id
            self._commit_ckpt(state)
            done += 1
            # auto-compaction policy (ctor doc): keep every family's
            # MERGE-on-read chain bounded. Runs AFTER the commit, so a
            # crash inside compact never loses the snapshot.
            if self.max_chain is not None and self.chain_length(state) > self.max_chain:
                self.compact()
                state = self._read_ckpt()
        return done

    def _process_one(self, state: dict, snap_id: int, snap_path: str) -> None:
        t0 = time.time()
        raw = self.spark.read.parquet(snap_path)
        delta_m = derive_turn_metrics(raw)
        prev_version = state["version"]

        # StreamState carry: seed each conversation's first-in-snapshot
        # latency from the previous snapshot's last turn. The state read
        # is delta-sized too: only the snapshot's own conversations are
        # resolved down the chain.
        prev_state = (
            None
            if prev_version == 0
            else self._resolve_chain(
                self._state_base(),
                prev_version,
                ["conv_id"],
                touched=raw.select("conv_id").distinct(),
            )
        )
        if prev_state is not None:
            delta_m = delta_m.join(prev_state, "conv_id", "left").withColumn(
                "latency_us",
                F.coalesce(
                    F.col("latency_us"), F.col("ts_us") - F.col("last_ts_us")
                ),
            ).drop("last_turn_idx", "last_ts_us")
        delta_m = delta_m.persist()

        # per-conversation span of this delta: min turn (out-of-order
        # detection) and max (turn, ts) (state advance) in one aggregate
        delta_span = delta_m.groupBy("conv_id").agg(
            F.min("turn_idx").alias("_min_turn"),
            F.max(F.struct("turn_idx", "ts_us")).alias("_new"),
        ).persist()

        # out-of-order detection (heal trigger, module doc): arriving
        # turns at or before the carried last_turn_idx mean this
        # conversation's derived latencies are provisional until heal()
        if prev_state is not None:
            ooo = (
                delta_span.join(prev_state, "conv_id")
                .filter(F.col("_min_turn") <= F.col("last_turn_idx"))
                .select("conv_id")
            )
            if ooo.limit(1).count() > 0:
                ooo.write.mode("overwrite").parquet(
                    self._delta_path(self._pending_base(), snap_id)
                )

        # conv-state delta: ONLY the touched conversations' new last turn
        if prev_state is None:
            new_state = delta_span.select("conv_id", F.col("_new").alias("_l"))
        else:
            new_state = delta_span.join(prev_state, "conv_id", "left").select(
                "conv_id",
                F.greatest(
                    F.col("_new"),
                    F.when(
                        F.col("last_turn_idx").isNotNull(),
                        F.struct(
                            F.col("last_turn_idx").alias("turn_idx"),
                            F.col("last_ts_us").alias("ts_us"),
                        ),
                    ),
                ).alias("_l"),
            )
        new_state.select(
            "conv_id",
            F.col("_l.turn_idx").alias("last_turn_idx"),
            F.col("_l.ts_us").alias("last_ts_us"),
        ).write.mode("overwrite").parquet(
            self._delta_path(self._state_base(), snap_id)
        )

        lineage_files = sorted(
            f for f in os.listdir(snap_path) if f.endswith(".parquet")
        )
        metric_rows = []
        for tier in TIERS:
            delta = rollup_from_turns(delta_m, tier).select(
                "conv_id", "window_start_us", *TIER_AGG_COLS, "tier"
            )
            # late data older than the committed retention bound is
            # dropped at ingest — it would be invisible (read-filtered)
            # and immediately eviction-eligible anyway, and admitting it
            # would let the running totals drift from what reads see
            lo = state["retention_bounds"].get(tier)
            if lo is not None:
                delta = delta.filter(F.col("window_start_us") >= F.lit(lo))
            delta = delta.persist()
            # previous values of ONLY the touched windows — a semi-join
            # down the chain, never a full-table read (class doc)
            prev_rows = self._resolve_chain(
                self._tier_base(tier),
                prev_version,
                _WINDOW_KEYS,
                touched=delta.select(*_WINDOW_KEYS),
                bound_us=state["retention_bounds"].get(tier),
            )
            merged = merge_tier(prev_rows, delta)
            out = self._delta_path(self._tier_base(tier), snap_id)
            merged.write.mode("overwrite").parquet(out)

            # rollup-count totals: previous committed totals + delta-sized
            # aggregates — NEVER an O(table) rescan. New windows = touched
            # minus previously-existing touched; new points = merged sum
            # minus previous touched sum.
            def _stats(df):
                if df is None:
                    return 0, 0
                r = df.agg(
                    F.count(F.lit(1)).alias("w"),
                    F.coalesce(F.sum("n_points"), F.lit(0)).alias("p"),
                ).collect()[0]
                return int(r["w"]), int(r["p"])

            prev_w, prev_p = _stats(prev_rows)
            new_w, new_p = _stats(self.spark.read.parquet(out))
            tot = state["totals"].setdefault(tier, {"n_windows": 0, "n_points": 0})
            tot["n_windows"] += new_w - prev_w
            tot["n_points"] += new_p - prev_p
            delta.unpersist()
            metric_rows.append(
                (
                    state["run_id"],
                    snap_id,
                    tier,
                    int(tot["n_windows"]),
                    int(tot["n_points"]),
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
        delta_span.unpersist()
        delta_m.unpersist()

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
        # same ingest-time retention drop as the aggregate path
        lo = self._read_ckpt()["retention_bounds"].get(tier)
        if lo is not None:
            delta_pts = delta_pts.filter(
                window_start_col(F.col("ts_us"), tier) >= F.lit(lo)
            )
        touched = delta_pts.select(
            "conv_id",
            window_start_col(F.col("ts_us"), tier).alias("window_start_us"),
        ).distinct()
        # chain read pruned to the touched CONVERSATIONS at each delta file
        # (semi-join below the latest-wins window, so parquet row-group
        # stats prune unread convs): all windows of a touched conversation
        # are needed to restore old points' turn_idx from cumulative
        # n_points — a metadata scan; only the touched windows' payloads
        # are decoded below
        prev = self._resolve_chain(
            self._packed_base(tier),
            prev_version,
            _WINDOW_KEYS,
            touched=touched.select("conv_id").distinct(),
            touched_on=["conv_id"],
            bound_us=lo,
        ) if prev_version > 0 else None
        if prev is None:
            pts = delta_pts
        else:
            prev_conv = prev
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

    # -- heal (mst_groupheal analogue) ----------------------------------
    def heal(self) -> int:
        """Repair every conversation flagged out-of-order since the last
        heal: re-derive its per-turn metrics from ALL raw snapshots (the
        batch path is order-insensitive), then write corrective ``d{v}h``
        chain entries for every table family — aggregate tiers, packed
        tiers, conv state. Afterwards all reads are byte-identical to a
        full recompute (tests assert) and incremental mode resumes.

        The reference's analogue walks a broken trace group and re-sorts
        / re-merges its segments in place (mst_groupheal,
        /root/reference/libmseed/traceutils.c:776-915; out-of-order
        insertion tracelist.c:392-556); here the "group" is the affected
        conversation set and the repair is a scoped batch recompute —
        O(affected conversations), never O(table).

        Crash-safe: heal dirs are deterministic overwrites keyed by the
        committed version, and a ``d{v}h`` entry is INVISIBLE to chain
        reads until ``healed_through`` reaches v (_chain_dirs gate) — the
        watermark advances only after every family's dir is fully
        written, so a mid-heal crash leaves reads exactly as before the
        heal and the rerun replays clean. Stale heal debris above the
        watermark is garbage-collected first, so a later heal cannot
        resurrect it. Returns the number of conversations healed."""
        state = self._maybe_recover(self._read_ckpt())
        v = state["version"]
        if v == 0:
            return 0
        self._gc_uncommitted_heal(state)
        # EVERY pending dir is due, regardless of version: heal deletes
        # the dirs it processed only AFTER the watermark commit, so a
        # leftover means "not certainly healed" and is re-healed (the
        # repair is a deterministic overwrite — idempotent). Flags can
        # also arrive from the streaming path at an already-healed
        # version (streaming/rollup_stream.route_ooo_to_pending); a
        # watermark filter here would drop those forever.
        base = self._pending_base()
        pend_dirs = (
            [
                os.path.join(base, n)
                for n in sorted(os.listdir(base))
                if _DELTA_RE.match(n)
            ]
            if os.path.isdir(base)
            else []
        )
        if not pend_dirs:
            return 0
        convs = (
            reduce(
                DataFrame.unionByName,
                [self.spark.read.parquet(p) for p in pend_dirs],
            )
            .select("conv_id")
            .distinct()
            .persist()
        )
        n_convs = convs.count()
        if n_convs:
            snap_paths = [
                p for sid, p in list_snapshots(self.input_dir) if sid <= v
            ]
            raw = self.spark.read.parquet(*snap_paths).join(
                convs, "conv_id", "left_semi"
            )
            healed_m = derive_turn_metrics(raw).persist()
            for tier in TIERS:
                rows = rollup_from_turns(healed_m, tier).select(
                    "conv_id", "window_start_us", *TIER_AGG_COLS, "tier"
                )
                # respect committed evictions: healed rows never resurrect
                # windows behind the retention bound
                lo = state["retention_bounds"].get(tier)
                if lo is not None:
                    rows = rows.filter(F.col("window_start_us") >= F.lit(lo))
                rows.write.mode("overwrite").parquet(
                    self._delta_path(self._tier_base(tier), v, heal=True)
                )
            from ..operators.pack import pack_tier

            for tier in self.pack_tiers:
                packed = pack_tier(healed_m, tier)
                lo = state["retention_bounds"].get(tier)
                if lo is not None:
                    packed = packed.filter(F.col("window_start_us") >= F.lit(lo))
                packed.write.mode("overwrite").parquet(
                    self._delta_path(self._packed_base(tier), v, heal=True)
                )
            healed_m.groupBy("conv_id").agg(
                F.max(F.struct("turn_idx", "ts_us")).alias("_l")
            ).select(
                "conv_id",
                F.col("_l.turn_idx").alias("last_turn_idx"),
                F.col("_l.ts_us").alias("last_ts_us"),
            ).write.mode("overwrite").parquet(
                self._delta_path(self._state_base(), v, heal=True)
            )
            healed_m.unpersist()
        convs.unpersist()
        state["healed_through"] = v
        self._commit_ckpt(state)
        # delete the processed pending dirs only now: a crash before this
        # point re-heals them (idempotent); deleting earlier could lose
        # flags. Dirs that appeared concurrently stay for the next heal.
        for p in pend_dirs:
            shutil.rmtree(p, ignore_errors=True)
        return n_convs

    # -- retention (downsample-and-expire) ------------------------------
    def apply_retention(self, now_us: int, horizons=None) -> DataFrame:
        """Evict expired windows per tier: commit the per-tier retention
        bound into the checkpoint (a pure predicate every chain read
        applies — the metadata-only DELETE of operators/retention.py;
        Iceberg drops the partitions in metadata the same way), update
        the running totals by the evicted counts, and write the sweep
        accounting to the ``retention/`` table — packed tiers get their
        own accounting rows (tier ``packed:{t}``, same horizon as the
        aggregate twin; their reads honor the same committed bound).

        Commit order: bounds + totals go into the checkpoint FIRST, the
        accounting parquet is written after — so ``retention_table`` never
        shows a sweep whose eviction did not commit (a crash between the
        two loses only the accounting row, and a rerun with the same
        ``now_us`` rewrites it keyed-idempotently). Physical space is
        reclaimed later by ``compact()``. Returns the accounting rows."""
        state = self._maybe_recover(self._read_ckpt())
        v = state["version"]
        tiers = {
            t: df
            for t in TIERS
            if (df := self.tier(t, v)) is not None
        }
        sweep = retention_sweep(tiers, now_us, horizons) if tiers else None
        rows = list(sweep.collect()) if sweep is not None else []
        # packed-tier accounting: same bound as the tier of the same name
        # (windows are the unit of eviction for both representations)
        packed_rows = []
        for t in self.pack_tiers:
            pdf = self.packed_tier(t, v)
            if pdf is None:
                continue
            pr = retention_sweep({t: pdf}, now_us, horizons).collect()[0]
            packed_rows.append((f"packed:{t}", pr))
        for r in rows:
            tier = r["tier"]
            lo = retention_bound_us(tier, now_us, horizons)
            if lo is None:
                continue
            old = state["retention_bounds"].get(tier)
            state["retention_bounds"][tier] = max(old or lo, lo)
            tot = state["totals"].get(tier)
            if tot is not None:
                tot["n_windows"] -= int(r["n_evicted"])
                tot["n_points"] -= int(r["pts_evicted"])
        self._commit_ckpt(state)
        acct = self.spark.createDataFrame(
            [
                (int(now_us), r["tier"], r["n_kept"], r["n_evicted"],
                 r["pts_kept"], r["pts_evicted"])
                for r in rows
            ]
            + [
                (int(now_us), name, r["n_kept"], r["n_evicted"],
                 r["pts_kept"], r["pts_evicted"])
                for name, r in packed_rows
            ],
            "swept_at_us long, tier string, n_kept long, n_evicted long,"
            " pts_kept long, pts_evicted long",
        )
        acct.write.mode("overwrite").parquet(
            os.path.join(self.work_dir, "retention", f"sweep_{now_us:020d}")
        )
        return acct

    def serve(self, now_us: int, horizons=None) -> DataFrame:
        """Age-banded serving view over the maintained tiers: the finest
        retained tier per age band (operators/retention.serve_tiered),
        read straight off the delta chains. Pure prunable predicates +
        union — the query a dashboard runs against this store."""
        from ..operators.retention import serve_tiered

        tiers = {
            t: df for t in TIERS if (df := self.tier(t)) is not None
        }
        return serve_tiered(tiers, now_us, horizons)

    # -- maintenance ----------------------------------------------------
    def _compact_jobs(self, state: dict) -> list[tuple[str, list[str], int | None]]:
        """(base, keys, retention bound) for every chained table family."""
        jobs = [
            (self._tier_base(t), _WINDOW_KEYS, state["retention_bounds"].get(t))
            for t in TIERS
        ]
        jobs += [
            (self._packed_base(t), _WINDOW_KEYS, state["retention_bounds"].get(t))
            for t in self.pack_tiers
        ]
        jobs.append((self._state_base(), ["conv_id"], None))
        return jobs

    def _gc_uncommitted_heal(self, state: dict) -> None:
        """Remove heal dirs whose version exceeds the committed
        ``healed_through`` — debris from a crashed heal(). Without this GC
        a later heal at a higher version would advance the watermark past
        the orphan and resurrect its torn contents into chain reads."""
        ht = state["healed_through"]
        for base, _, _ in self._compact_jobs(state):
            if not os.path.isdir(base):
                continue
            for name in os.listdir(base):
                m = _DELTA_RE.match(name)
                if m and m.group(2) and int(m.group(1)) > ht:
                    shutil.rmtree(os.path.join(base, name))

    def _maybe_recover(self, state: dict) -> dict:
        """Finish a crashed compact() swap before anything reads a chain.

        Called from every public entry point: if the checkpoint carries a
        ``compact_intent``, the staged-but-unswapped families are swapped
        now (idempotent — a family whose ``_compact_tmp`` is gone was
        already adopted) and the intent is cleared. Cheap no-op otherwise."""
        if "compact_intent" in state:
            self._finish_compact(state)
        return state

    def _finish_compact(self, state: dict) -> None:
        """Phase 2 of compact(): per family, drop the superseded chain
        entries and adopt the staged ``_compact_tmp`` as ``d{v}`` (the
        os.replace is atomic; a crash anywhere here is resumed by
        _maybe_recover on the next entry point, which re-runs this loop —
        families with no staged tmp left are skipped)."""
        v = state["compact_intent"]
        for base, _, _ in self._compact_jobs(state):
            tmp = os.path.join(base, "_compact_tmp")
            if not os.path.isdir(tmp):
                continue  # never staged, or already swapped on a prior run
            for p in self._chain_dirs(base, v, state["healed_through"]):
                shutil.rmtree(p)
            os.replace(tmp, self._delta_path(base, v))
        # pending dirs are NOT touched here: heal() owns their lifecycle
        # (a leftover means not-certainly-healed under its deletion
        # protocol, and compacting must never lose heal flags)
        state.pop("compact_intent")
        self._commit_ckpt(state)

    def chain_length(self, state: dict | None = None) -> int:
        """Longest delta chain across all table families (auto-compaction
        trigger metric; also what an operator would alert on)."""
        state = state or self._read_ckpt()
        return max(
            (
                len(self._chain_dirs(b, state["version"], state["healed_through"]))
                for b, _, _ in self._compact_jobs(state)
            ),
            default=0,
        )

    def compact(self) -> None:
        """Fold every chain into a single base directory at the committed
        version (Iceberg's rewrite_data_files maintenance action): resolve
        latest-wins + retention bounds, rewrite, drop the old entries.
        Reads before/after are row-identical (tests assert).

        Crash-safe two-phase protocol (the parquet standin for Iceberg's
        atomic metadata swap):

          1. stage every family's resolved table under ``_compact_tmp``
             (a name the chain regex never matches — invisible to reads;
             a crash here leaves harmless debris the next run overwrites)
          2. atomically commit ``compact_intent = v`` in the checkpoint
          3. per family: drop superseded entries, adopt tmp as ``d{v}``
          4. clear the intent, commit

        A crash inside (3)-(4) is finished by ``_maybe_recover`` on the
        next entry point (reads included), so a half-swapped chain is
        never served."""
        state = self._maybe_recover(self._read_ckpt())
        v = state["version"]
        if v == 0:
            return
        # heal debris would otherwise be resurrected once healed_through
        # advances; compacting is the natural GC point
        self._gc_uncommitted_heal(state)
        staged = 0
        for base, keys, bound in self._compact_jobs(state):
            dirs = self._chain_dirs(base, v, state["healed_through"])
            if not dirs:
                continue
            resolved = self._resolve_chain(
                base, v, keys, bound_us=bound, healed_through=state["healed_through"]
            )
            tmp = os.path.join(base, "_compact_tmp")
            resolved.write.mode("overwrite").parquet(tmp)
            staged += 1
        if staged == 0:
            return
        state["compact_intent"] = v
        self._commit_ckpt(state)
        self._finish_compact(state)
