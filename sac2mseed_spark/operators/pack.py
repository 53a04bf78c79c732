"""Window packing: per-(conv_id, tier, window) compressed series blobs.

The msr_pack analogue (/root/reference/libmseed/pack.c:70-395), Spark-first.
Two physically different plans, bit-identical outputs (tests assert):

  default (flat path, one shuffle):
      repartition on (conv_id, window_start_us) -> sortWithinPartitions on
      the stable turn order -> ONE mapInPandas pass over flat primitive
      Arrow columns (int64/float64 — no struct lists, no collect_list, no
      interpreted higher-order functions). The kernel carries incomplete
      window groups across Arrow batches, detects window/chunk boundaries
      vectorially, runs the numpy codec once per batch, and assembles
      final blobs in the same pass.

  salted=True (skew path, two shuffles):
      group by (conv_id, window, chunk_id) — chunk_id is a pure function
      of turn_idx (operators/skew.py), so a pathologically hot window
      splits deterministically across executors — encode chunks, then a
      second grouping assembles blobs. Use when single windows exceed
      executor memory; payload bytes are IDENTICAL to the flat path
      because chunk boundaries depend only on turn_idx values.

Windows are self-delimiting (each chunk re-anchors at its own X0) so there
is NO cross-window or cross-chunk state — the property that makes packing
embarrassingly parallel and resume-safe (SURVEY.md §7 phase 2 decision).
Continuity of Xn -> next X0 is verified after the fact by
verify_continuity() instead of being a sequential dependence at pack time
(StreamState, libmseed.h:458-465).

Design decision — blob granularity stays ONE WINDOW per blob
-----------------------------------------------------------
`tools/profile_unpack.py` showed the t_bench 1m tier is blob-bound:
~416k blobs of ~4 points each (conversations emit ~2 turns/min) put the
16-byte header + per-blob parse above the payload cost, and 1m
bytes/point sits at ~22.6. The reference amortizes this by packing
multiple frames per record (/root/reference/libmseed/pack.c:314-337),
and a multi-window segment blob here would similarly cut header share.
It is deliberately NOT adopted:

  * the incremental pipeline's unit of overwrite is the (conv, window)
    key (plans/pipeline.py merge_tier) — a blob spanning windows forces
    read-modify-write of untouched neighbor windows on every delta
    merge and heal, trading a storage constant for write amplification
    in the steady-state path;
  * the tier cascade already provides the amortization: 1h/1d blobs
    carry 60x/1440x more points per header, and retention moves old
    data to exactly those tiers — the 1m overhead is paid only on the
    freshest band;
  * serving-path selections prune on (conv, window) parquet ranges; a
    segment blob would widen every point lookup to its segment.

So ~22.6 bytes/point at 1m is recorded as the accepted floor for
fine-tier freshness, not an oversight. Revisit only if a deployment
holds months of data at 1m granularity (i.e. misuses the tier system).
"""

from __future__ import annotations

import struct as _struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import TIERS
from ..codec import MAGIC, VERSION
from ..codec.vectorized import encode_chunks_raw, encode_chunks_vec
from .rollup import window_start_col
from .skew import CHUNK_POINTS

# value streams packed per window, in order (stream 0 carries the x0/xn
# invariant columns). NULL latency (first turn) packs as NaN bits.
STREAMS = ["latency_us", "token_count"]

_CHUNK_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("window_start_us", LongType()),
        StructField("chunk_id", IntegerType()),
        StructField("n_points", LongType()),
        StructField("first_ts_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("x0", LongType()),  # uint64 bit pattern viewed as int64
        StructField("xn", LongType()),
        StructField("chunk", BinaryType()),
    ]
)

PACKED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("window_start_us", LongType()),
        StructField("n_points", LongType()),
        StructField("n_chunks", IntegerType()),
        StructField("first_ts_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("x0", LongType()),
        StructField("xn", LongType()),
        StructField("payload", BinaryType()),
        StructField("crc32", LongType()),
    ]
)

_HEAD_FMT = "<BBIQ"


def _field(name: str):
    # one-arg closure: F.transform dispatches on lambda arity, so a
    # `lambda x, s=s:` default-arg capture would receive the array index
    return lambda x: x[name]


# ----------------------------------------------------------------------
# flat path (default)
# ----------------------------------------------------------------------

_HEADER_LEN = 16  # MAGIC(2) + version(1) + n_streams(1) + n_chunks(4) + n_points(8)


def _ranges(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Concatenated [s, s+len) index ranges (the segmented-arange trick)."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    rep = np.repeat(starts - np.concatenate([[0], np.cumsum(lengths)[:-1]]), lengths)
    return rep + np.arange(total, dtype=np.int64)


def _conv_ws_change(tbl) -> np.ndarray:
    """Boolean array: row starts a new (conv_id, window_start_us) group.
    Comparison happens inside Arrow — no per-row python strings."""
    import pyarrow.compute as pc

    n = tbl.num_rows
    new = np.ones(n, dtype=bool)
    if n > 1:
        conv = tbl.column("conv_id").chunk(0)
        ws = tbl.column("window_start_us").chunk(0)
        c = pc.not_equal(conv.slice(1, n - 1), conv.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        w = pc.not_equal(ws.slice(1, n - 1), ws.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        new[1:] = c | w
    return new


def _run_block_arrow(tbl):
    """Encode + assemble one contiguous sorted block; returns a RecordBatch.

    Fully vectorized: chunk bytes come back as one buffer from
    encode_chunks_raw; window blobs are built by writing 16-byte headers at
    computed offsets and gathering chunk spans; the Arrow binary column is
    constructed directly from (offsets, data) buffers — zero python string
    or bytes objects anywhere.
    """
    import pyarrow as pa

    n = tbl.num_rows
    ws = tbl.column("window_start_us").chunk(0).to_numpy()
    turn = tbl.column("turn_idx").chunk(0).to_numpy()
    ts = tbl.column("ts_us").chunk(0).to_numpy()
    streams = [
        np.ascontiguousarray(
            tbl.column(s).chunk(0).to_numpy(zero_copy_only=False), dtype=np.float64
        ).view(np.uint64)
        for s in STREAMS
    ]

    new_win = _conv_ws_change(tbl)
    cp = turn // CHUNK_POINTS
    new_chunk = new_win.copy()
    if n > 1:
        new_chunk[1:] |= cp[1:] != cp[:-1]
    chunk_starts = np.flatnonzero(new_chunk)
    offsets = np.concatenate([chunk_starts, [n]]).astype(np.int64)
    buf, chunk_off, stats = encode_chunks_raw(ts, offsets, streams)

    win_starts = np.flatnonzero(new_win)
    W = len(win_starts)
    win_chunk_start = np.searchsorted(chunk_starts, win_starts)
    win_chunk_end = np.concatenate([win_chunk_start[1:], [len(chunk_starts)]])
    n_chunks = (win_chunk_end - win_chunk_start).astype(np.int32)
    win_row_end = np.concatenate([win_starts[1:], [n]])
    n_points = (win_row_end - win_starts).astype(np.int64)

    # blob layout: per window a 16-byte header + its contiguous chunk span
    span_start = chunk_off[win_chunk_start]
    span = chunk_off[win_chunk_end] - span_start
    out_off = np.zeros(W + 1, dtype=np.int64)
    np.cumsum(_HEADER_LEN + span, out=out_off[1:])
    out = np.empty(int(out_off[-1]), dtype=np.uint8)
    h = out_off[:-1]
    out[h] = MAGIC[0]
    out[h + 1] = MAGIC[1]
    out[h + 2] = VERSION
    out[h + 3] = len(STREAMS)
    for j in range(4):  # n_chunks, little-endian u32
        out[h + 4 + j] = ((n_chunks.astype(np.uint64) >> np.uint64(8 * j)) & np.uint64(0xFF)).astype(np.uint8)
    for j in range(8):  # n_points, little-endian u64
        out[h + 8 + j] = ((n_points.astype(np.uint64) >> np.uint64(8 * j)) & np.uint64(0xFF)).astype(np.uint8)
    out[_ranges(h + _HEADER_LEN, span)] = buf[_ranges(span_start, span)]

    mv = memoryview(out)
    crcs = np.fromiter(
        (zlib.crc32(mv[out_off[i] : out_off[i + 1]]) for i in range(W)),
        dtype=np.int64,
        count=W,
    )

    if out_off[-1] > np.iinfo(np.int32).max:
        # >2 GiB of encoded payload in one carried block would silently
        # wrap the Arrow int32 offsets; fail loudly — the caller should
        # route such pathologically hot windows through the salted path
        raise ValueError(
            f"encoded block exceeds 2 GiB ({int(out_off[-1])} bytes); "
            "use pack_tier(salted=True) for this key distribution"
        )
    payload = pa.Array.from_buffers(
        pa.binary(),
        W,
        [None, pa.py_buffer(out_off.astype(np.int32)), pa.py_buffer(out)],
    )
    conv_out = tbl.column("conv_id").chunk(0).take(pa.array(win_starts))
    return pa.RecordBatch.from_arrays(
        [
            conv_out,
            pa.array(ws[win_starts]),
            pa.array(n_points),
            pa.array(n_chunks),
            pa.array(stats["first_ts"][win_chunk_start].astype(np.int64)),
            pa.array(stats["last_ts"][win_chunk_end - 1].astype(np.int64)),
            pa.array(stats["x0"][win_chunk_start].view(np.int64)),
            pa.array(stats["xn"][win_chunk_end - 1].view(np.int64)),
            payload,
            pa.array(crcs),
        ],
        names=[
            "conv_id",
            "window_start_us",
            "n_points",
            "n_chunks",
            "first_ts_us",
            "last_ts_us",
            "x0",
            "xn",
            "payload",
            "crc32",
        ],
    )


def _pack_flat_arrow(batches) -> "Iterator":
    """One pass over a partition's sorted flat rows (Arrow RecordBatches);
    the trailing incomplete window group is carried into the next batch.

    SPARK_GRAFT_PACK_PROF=1 prints per-worker (kernel s, rows) to stderr
    on exhaustion — separates numpy encode time from the Arrow/socket
    transfer + scheduling time around it when diagnosing contention."""
    import os
    import sys
    import time

    import pyarrow as pa

    prof = os.environ.get("SPARK_GRAFT_PACK_PROF") == "1"
    k_s, k_rows = 0.0, 0
    carry = None  # pa.Table

    for rb in batches:
        if rb.num_rows == 0:
            continue
        t0 = time.perf_counter() if prof else 0.0
        tbl = pa.Table.from_batches([rb])
        if carry is not None:
            tbl = pa.concat_tables([carry, tbl]).combine_chunks()
        new = _conv_ws_change(tbl)
        change = np.flatnonzero(new[1:])  # group starts after row 0
        start = int(change[-1]) + 1 if len(change) else 0
        done, carry = tbl.slice(0, start), tbl.slice(start)
        out = _run_block_arrow(done) if done.num_rows else None
        if prof:
            k_s += time.perf_counter() - t0
            k_rows += rb.num_rows
        if out is not None:
            yield out
    if carry is not None and carry.num_rows:
        t0 = time.perf_counter() if prof else 0.0
        out = _run_block_arrow(carry)
        if prof:
            k_s += time.perf_counter() - t0
        yield out
    if prof and k_rows:
        print(f"PACK_PROF kernel_s={k_s:.3f} rows={k_rows}", file=sys.stderr)


def pack_tier(
    metrics: DataFrame,
    tier: str,
    salted: bool = False,
    n_partitions: int | None = None,
    clustered_by_conv: bool = False,
    assume_sorted: bool = False,
) -> DataFrame:
    """metrics (derive_turn_metrics output) -> packed window blobs.

    ``clustered_by_conv=True`` skips the repartition exchange when the
    caller guarantees rows of one conv_id share a partition — true for
    derive_turn_metrics output, whose lag window already hash-partitioned
    on conv_id. The per-partition sort still runs (cheap on the window's
    near-sorted output); payload bytes are identical either way.

    ``assume_sorted=True`` (implies clustered_by_conv) also skips the
    per-partition sort, for callers whose rows are ALREADY in
    (conv_id, turn_idx, ts_us) order within each partition — true when
    packing straight off derive_turn_metrics output or its cache, whose
    lag window sorted exactly that order. Preconditions for byte identity
    with the sorting path: unique turn_idx per conversation and ts
    monotone w.r.t. turn_idx (then (conv, turn, ts) order equals
    (conv, window, turn, ts) order). Skipping the Tungsten sort removes
    a full materialization of every row — the pack stage becomes one
    cache-scan + one Arrow pass.
    """
    if salted:
        return _pack_tier_salted(metrics, tier)
    flat = metrics.select(
        "conv_id",
        window_start_col(F.col("ts_us"), tier).alias("window_start_us"),
        F.col("turn_idx").cast("long").alias("turn_idx"),
        "ts_us",
        *[F.col(s).cast("double").alias(s) for s in STREAMS],
    )
    keys = ["conv_id", "window_start_us"]
    if not (clustered_by_conv or assume_sorted):
        flat = (
            flat.repartition(n_partitions, "conv_id")
            if n_partitions
            else flat.repartition("conv_id")
        )
    if not assume_sorted:
        flat = flat.sortWithinPartitions(*keys, "turn_idx", "ts_us", *STREAMS)
    packed = flat.mapInArrow(_pack_flat_arrow, schema=PACKED_SCHEMA)
    return packed.withColumn("tier", F.lit(tier))


def pack_tier_adaptive(
    metrics: DataFrame,
    tier: str,
    hot_rows: int = 2_000_000,
    sample_frac: float = 0.01,
) -> DataFrame:
    """Sampled heavy-hitter probe chooses the physical pack plan.

    Default: the flat single-pass plan. If any single (conv_id, window)
    group's estimated row count exceeds ``hot_rows`` (a group too big for
    one task's memory), route through the chunk-salted two-phase plan
    instead — the AQE-style runtime decision, paid as one cheap sampled
    count at plan time. The probe keys on the actual pack grouping key,
    not conv_id totals, so a long-lived conversation spread across many
    small windows does not trip it. Payload bytes are IDENTICAL either
    way because chunk boundaries are pure functions of turn_idx
    (operators/skew.py contract; tests/test_pack_spark.py asserts)."""
    from .skew import heavy_hitters

    probe = metrics.select(
        "conv_id", window_start_col(F.col("ts_us"), tier).alias("window_start_us")
    )
    hot = heavy_hitters(probe, ["conv_id", "window_start_us"], hot_rows, sample_frac)
    return pack_tier(metrics, tier, salted=bool(hot.take(1)))


# ----------------------------------------------------------------------
# salted path (explicit skew splitting for pathologically hot windows)
# ----------------------------------------------------------------------

def _encode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf) == 0:
            continue
        ts_arrays = pdf["ts_arr"].to_numpy()
        offsets = np.zeros(len(pdf) + 1, dtype=np.int64)
        offsets[1:] = np.cumsum([len(a) for a in ts_arrays])
        ts_flat = np.concatenate(ts_arrays).astype(np.int64)
        streams_flat = []
        for s in STREAMS:
            vals = np.concatenate(pdf[f"{s}_arr"].to_numpy()).astype(np.float64)
            streams_flat.append(vals.view(np.uint64))
        chunk_bytes, stats = encode_chunks_vec(ts_flat, offsets, streams_flat)
        yield pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].to_numpy(),
                "window_start_us": pdf["window_start_us"].to_numpy(),
                "chunk_id": pdf["chunk_id"].to_numpy(),
                "n_points": stats["n_points"].astype(np.int64),
                "first_ts_us": stats["first_ts"].astype(np.int64),
                "last_ts_us": stats["last_ts"].astype(np.int64),
                "x0": stats["x0"].view(np.int64),
                "xn": stats["xn"].view(np.int64),
                "chunk": chunk_bytes,
            }
        )


def _assemble_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    n_streams = len(STREAMS)
    for pdf in batches:
        if len(pdf) == 0:
            continue
        payloads, crcs = [], []
        n_points_col = []
        for chunks in pdf["chunks"].to_numpy():
            # chunks: list of dicts sorted by chunk_id (sort_array upstream)
            total = int(sum(c["n_points"] for c in chunks))
            blob = MAGIC + _struct.pack(_HEAD_FMT, VERSION, n_streams, len(chunks), total)
            blob += b"".join(bytes(c["chunk"]) for c in chunks)
            payloads.append(blob)
            crcs.append(zlib.crc32(blob))
            n_points_col.append(total)
        first = [c[0] for c in pdf["chunks"].to_numpy()]
        last = [c[-1] for c in pdf["chunks"].to_numpy()]
        yield pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].to_numpy(),
                "window_start_us": pdf["window_start_us"].to_numpy(),
                "n_points": np.array(n_points_col, dtype=np.int64),
                "n_chunks": [len(c) for c in pdf["chunks"].to_numpy()],
                "first_ts_us": [c["first_ts_us"] for c in first],
                "last_ts_us": [c["last_ts_us"] for c in last],
                "x0": [c["x0"] for c in first],
                "xn": [c["xn"] for c in last],
                "payload": payloads,
                "crc32": np.array(crcs, dtype=np.int64),
            }
        )


def _pack_tier_salted(metrics: DataFrame, tier: str) -> DataFrame:
    pts = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("turn_idx"),
                F.col("ts_us"),
                *[F.col(s).cast("double").alias(s) for s in STREAMS],
            )
        )
    )
    grouped = (
        metrics.withColumn("window_start_us", window_start_col(F.col("ts_us"), tier))
        .withColumn("chunk_id", F.floor(F.col("turn_idx") / CHUNK_POINTS).cast("int"))
        .groupBy("conv_id", "window_start_us", "chunk_id")
        .agg(pts.alias("pts"))
        .select(
            "conv_id",
            "window_start_us",
            "chunk_id",
            F.transform("pts", _field("ts_us")).alias("ts_arr"),
            *[F.transform("pts", _field(s)).alias(f"{s}_arr") for s in STREAMS],
        )
    )
    chunks = grouped.mapInPandas(_encode_partition, schema=_CHUNK_SCHEMA)
    assembled = (
        chunks.groupBy("conv_id", "window_start_us")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "chunk_id",
                        "n_points",
                        "first_ts_us",
                        "last_ts_us",
                        "x0",
                        "xn",
                        "chunk",
                    )
                )
            ).alias("chunks")
        )
        .mapInPandas(_assemble_partition, schema=PACKED_SCHEMA)
        .withColumn("tier", F.lit(tier))
    )
    return assembled


# ----------------------------------------------------------------------
# unpack + audits
# ----------------------------------------------------------------------

_POINT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("window_start_us", LongType()),
        StructField("ts_us", LongType()),
    ]
    + [StructField(f"{s}_f", DoubleType()) for s in STREAMS]
)

_POINT_SCHEMA_POS = StructType(
    _POINT_SCHEMA.fields + [StructField("pos", LongType())]
)


def _binary_spans(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(data, starts, ends) views of an Arrow Binary/LargeBinary array's
    value buffer — no per-row ``bytes`` objects, no copies."""
    import pyarrow as pa

    off_dtype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    off = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    return data, off[:-1], off[1:]


def _decode_partition_arrow(batches, with_pos: bool = False) -> "Iterator":
    """Vectorized unpack of a whole Arrow batch of payload blobs: one
    decode_concat call per batch (codec/decode_vec.py wavefront kernel),
    output columns built from flat numpy arrays."""
    import pyarrow as pa

    from ..codec.decode_vec import check_xn, decode_concat

    for rb in batches:
        if rb.num_rows == 0:
            continue
        names = rb.schema.names
        pay = rb.column(names.index("payload"))
        data, starts, ends = _binary_spans(pay)
        blob_pts, point_off, ts_out, streams = decode_concat(data, starts, ends)
        xn = rb.column(names.index("xn")).to_numpy().view(np.uint64)
        check_xn(streams, point_off, xn)

        idx = np.repeat(np.arange(rb.num_rows), blob_pts)
        conv_out = rb.column(names.index("conv_id")).take(pa.array(idx))
        ws_out = rb.column(names.index("window_start_us")).to_numpy()[idx]
        arrays = [conv_out, pa.array(ws_out), pa.array(ts_out)]
        out_names = ["conv_id", "window_start_us", "ts_us"]
        for s in streams:
            arrays.append(pa.array(s.view(np.float64)))
        out_names += [f"{s}_f" for s in STREAMS]
        if with_pos:
            pos = np.arange(len(ts_out)) - np.repeat(point_off[:-1], blob_pts)
            arrays.append(pa.array(pos))
            out_names.append("pos")
        yield pa.RecordBatch.from_arrays(arrays, names=out_names)


def unpack_tier(packed: DataFrame, with_pos: bool = False) -> DataFrame:
    """Inverse of pack_tier: explode blobs back into per-point rows with the
    Xn integrity check (unpackdata.c:556-561 analogue) enforced per window.

    The read side is as first-class as the write side (the reference's
    unpack suite is larger than its pack suite, libmseed/unpackdata.c):
    one mapInArrow pass, whole-batch numpy wavefront decode, zero per-point
    Python. ``with_pos=True`` also emits each point's index within its
    blob — the deterministic intra-window order repack relies on."""
    cols = ["conv_id", "window_start_us", "payload", "xn"]
    schema = _POINT_SCHEMA_POS if with_pos else _POINT_SCHEMA
    return packed.select(*cols).mapInArrow(
        lambda batches: _decode_partition_arrow(batches, with_pos), schema=schema
    )


def read_tier_selection(
    packed: DataFrame,
    selections: list[tuple[str, int | None, int | None]],
) -> DataFrame:
    """SURVEY §3.2 read path (ms_readtraces_selection, fileutils.c:779):
    selections applied to the PACKED tier table first — the conv glob plus
    a coarse [first_ts_us, last_ts_us] overlap predicate prune whole blobs
    at the scan (the parse-with-selection short-circuit, fileutils.c:
    805-818) — then only surviving blobs are decoded, then the exact
    per-point time filter runs on the decoded rows."""
    from ..functions.selections import apply_selections, glob_match

    pred = None
    for glob, lo, hi in selections:
        p = glob_match("conv_id", glob)
        if lo is not None:
            p = p & (F.col("last_ts_us") >= F.lit(lo))
        if hi is not None:
            p = p & (F.col("first_ts_us") <= F.lit(hi))
        pred = p if pred is None else pred | p
    coarse = packed.filter(pred) if pred is not None else packed
    return apply_selections(unpack_tier(coarse), selections)


def repack_tier(packed: DataFrame, to_tier: str) -> DataFrame:
    """msrepack analogue (example/msrepack.c:49; SURVEY §3.3): decode a
    tier's payloads and re-encode at a coarser tier WITHOUT touching the
    raw table — decode → re-window → encode, all vectorized.

    Point order is reconstructed from (source window, position-in-blob),
    which equals the original turn order only when ts_us is monotone
    w.r.t. turn_idx within each conversation (windows are time-ordered,
    so an out-of-order timestamp re-sorts points across windows). Under
    that precondition AND dense turn_idx, repacked blobs are
    byte-identical to packing the coarser tier from raw metrics (tests
    assert); with sparse turn_idx or out-of-order timestamps the decoded
    VALUES are still identical but chunk boundaries (hence bytes) may
    diverge from a direct pack."""
    from pyspark.sql import Window

    pts = unpack_tier(packed, with_pos=True)
    w = Window.partitionBy("conv_id").orderBy("window_start_us", "pos")
    flat = pts.select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("long").alias("turn_idx"),
        "ts_us",
        *[F.col(f"{s}_f").alias(s) for s in STREAMS],
    )
    # the row_number window already hash-partitioned on conv_id
    return pack_tier(flat, to_tier, clustered_by_conv=True)


def verify_continuity(packed: DataFrame) -> DataFrame:
    """Cross-window chain audit: expose each window's x0 next to the
    previous window's xn — the StreamState comphistory relationship
    (pack.c:1003-1039) recast as a declarative lag instead of pack-time
    state. ``adjacent`` marks windows that directly follow their
    predecessor (no missing window between them)."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id", "tier").orderBy("window_start_us")
    tier_us = F.element_at(
        F.create_map(*[x for t, us in TIERS.items() for x in (F.lit(t), F.lit(us))]),
        F.col("tier"),
    )
    return packed.select(
        "conv_id",
        "tier",
        "window_start_us",
        "x0",
        "xn",
        F.lag("xn").over(w).alias("prev_xn"),
        F.lag("window_start_us").over(w).alias("prev_ws"),
    ).withColumn(
        "adjacent",
        F.col("prev_ws").isNotNull()
        & ((F.col("window_start_us") - F.col("prev_ws")) == tier_us),
    )
