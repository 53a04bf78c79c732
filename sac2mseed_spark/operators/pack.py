"""Window packing: per-(conv_id, tier, window) compressed series blobs.

The msr_pack analogue (/root/reference/libmseed/pack.c:70-395), Spark-first:

  stage 1 (partial): group by (conv_id, window, chunk_id) — chunk_id is a
      pure function of turn_idx (operators/skew.py), so hot windows split
      deterministically across executors — sort each group JVM-side
      (sort_array on a struct), then run the vectorized codec kernel over
      the WHOLE Arrow batch at once via mapInPandas (one numpy pass for
      thousands of chunks, no per-group Python).
  stage 2 (final): group chunks by (conv_id, window), concatenate in
      chunk order into a self-delimiting blob + crc32. Cheap byte work.

This partial/final split mirrors Spark's own two-phase aggregation and the
reference's record loop + StreamState, except windows are self-delimiting
(each chunk re-anchors at its own X0) so there is NO cross-window or
cross-chunk state — the property that makes packing embarrassingly parallel
and resume-safe (SURVEY.md §7 phase 2 decision). Continuity of Xn -> next
X0 is verified *after the fact* by verify_continuity() instead of being a
sequential dependence at pack time (StreamState, libmseed.h:458-465).
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
    head_fmt = "<BBIQ"
    for pdf in batches:
        if len(pdf) == 0:
            continue
        payloads, crcs = [], []
        n_points_col = []
        for chunks in pdf["chunks"].to_numpy():
            # chunks: list of dicts sorted by chunk_id (sort_array upstream)
            total = int(sum(c["n_points"] for c in chunks))
            blob = MAGIC + _struct.pack(head_fmt, VERSION, n_streams, len(chunks), total)
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


def _field(name: str):
    # one-arg closure: F.transform dispatches on lambda arity, so a
    # `lambda x, s=s:` default-arg capture would receive the array index
    return lambda x: x[name]


def pack_tier(metrics: DataFrame, tier: str) -> DataFrame:
    """metrics (derive_turn_metrics output) -> packed window blobs."""
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
