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
from ..codec.vectorized import encode_chunks_vec
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

def _assemble_block(conv, ws, turn_idx, ts, stream_cols):
    """Encode + assemble one contiguous, sorted block of rows.

    Returns a dict of output columns (one element per window).
    """
    n = len(ts)
    # window boundaries: change of (conv, ws)
    new_win = np.ones(n, dtype=bool)
    if n > 1:
        new_win[1:] = (conv[1:] != conv[:-1]) | (ws[1:] != ws[:-1])
    # chunk boundaries: window change OR turn_idx//CHUNK_POINTS change
    cp = turn_idx // CHUNK_POINTS
    new_chunk = new_win.copy()
    if n > 1:
        new_chunk[1:] |= cp[1:] != cp[:-1]
    chunk_starts = np.flatnonzero(new_chunk)
    offsets = np.concatenate([chunk_starts, [n]]).astype(np.int64)
    chunk_bytes, stats = encode_chunks_vec(ts, offsets, stream_cols)

    win_starts = np.flatnonzero(new_win)  # indices into rows
    # map chunks -> windows: which chunk index starts each window
    win_chunk_start = np.searchsorted(chunk_starts, win_starts)
    win_chunk_end = np.concatenate([win_chunk_start[1:], [len(chunk_starts)]])
    n_chunks = (win_chunk_end - win_chunk_start).astype(np.int32)
    win_row_end = np.concatenate([win_starts[1:], [n]])
    n_points = (win_row_end - win_starts).astype(np.int64)

    payloads, crcs = [], []
    for i in range(len(win_starts)):
        c0, c1 = win_chunk_start[i], win_chunk_end[i]
        blob = MAGIC + _struct.pack(
            _HEAD_FMT, VERSION, len(stream_cols), c1 - c0, int(n_points[i])
        )
        blob += b"".join(chunk_bytes[c0:c1])
        payloads.append(blob)
        crcs.append(zlib.crc32(blob))
    last_chunk = win_chunk_end - 1
    return {
        "conv_id": conv[win_starts],
        "window_start_us": ws[win_starts],
        "n_points": n_points,
        "n_chunks": n_chunks,
        "first_ts_us": stats["first_ts"][win_chunk_start].astype(np.int64),
        "last_ts_us": stats["last_ts"][last_chunk].astype(np.int64),
        "x0": stats["x0"][win_chunk_start].view(np.int64),
        "xn": stats["xn"][last_chunk].view(np.int64),
        "payload": payloads,
        "crc32": np.array(crcs, dtype=np.int64),
    }


def _pack_flat_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One pass over a partition's sorted flat rows; incomplete trailing
    window groups are carried into the next Arrow batch."""
    carry: pd.DataFrame | None = None

    def split_complete(pdf: pd.DataFrame):
        conv = pdf["conv_id"].to_numpy()
        ws = pdf["window_start_us"].to_numpy()
        change = np.flatnonzero((conv[1:] != conv[:-1]) | (ws[1:] != ws[:-1]))
        # start index of the final (possibly incomplete) group
        start = int(change[-1]) + 1 if len(change) else 0
        return pdf.iloc[:start], pdf.iloc[start:]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = _assemble_block(
            pdf["conv_id"].to_numpy(),
            pdf["window_start_us"].to_numpy(np.int64),
            pdf["turn_idx"].to_numpy(np.int64),
            pdf["ts_us"].to_numpy(np.int64),
            [pdf[s].to_numpy(np.float64).view(np.uint64) for s in STREAMS],
        )
        return pd.DataFrame(cols)

    for pdf in batches:
        if len(pdf) == 0:
            continue
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
        done, carry = split_complete(pdf)
        if len(done):
            yield run(done)
    if carry is not None and len(carry):
        yield run(carry)


def pack_tier(
    metrics: DataFrame,
    tier: str,
    salted: bool = False,
    n_partitions: int | None = None,
) -> DataFrame:
    """metrics (derive_turn_metrics output) -> packed window blobs."""
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
    flat = (
        flat.repartition(n_partitions, *keys) if n_partitions else flat.repartition(*keys)
    )
    packed = flat.sortWithinPartitions(
        *keys, "turn_idx", "ts_us", *STREAMS
    ).mapInPandas(_pack_flat_partition, schema=PACKED_SCHEMA)
    return packed.withColumn("tier", F.lit(tier))


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


def _decode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..codec import oracle

    for pdf in batches:
        rows = {c: [] for c in ["conv_id", "window_start_us", "ts_us"]}
        for s in STREAMS:
            rows[f"{s}_f"] = []
        for conv, ws, payload, xn in zip(
            pdf["conv_id"], pdf["window_start_us"], pdf["payload"], pdf["xn"]
        ):
            ts, streams = oracle.decode_blob(
                bytes(payload), expect_xn=int(np.uint64(np.int64(xn)))
            )
            n = len(ts)
            rows["conv_id"].extend([conv] * n)
            rows["window_start_us"].extend([ws] * n)
            rows["ts_us"].extend(ts)
            for s, bits in zip(STREAMS, streams):
                rows[f"{s}_f"].extend(
                    np.array(bits, dtype=np.uint64).view(np.float64).tolist()
                )
        yield pd.DataFrame(rows)


def unpack_tier(packed: DataFrame) -> DataFrame:
    """Inverse of pack_tier: explode blobs back into per-point rows with the
    Xn integrity check (unpackdata.c:556-561 analogue) enforced per window."""
    cols = ["conv_id", "window_start_us", "payload", "xn"]
    return packed.select(*cols).mapInPandas(_decode_partition, schema=_POINT_SCHEMA)


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
