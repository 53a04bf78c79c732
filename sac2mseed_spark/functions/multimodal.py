"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque BINARY columns with a typed metadata struct — the same
"small header row + opaque payload" shape as the packed tier tables (and the
reference's record model, /root/reference/libmseed/libmseed.h:467-499).

The Spark-side contract is real and tested: schemas, Arrow batch shapes,
mapInPandas signatures, partitioning. The actual pixel/sample decode is
STUBBED — this container has no image/audio libraries — behind
``_decode_real`` (raises NotImplementedError) with a deterministic fake
(`fake_decode=True`) used by tests and the driver queries: features are pure
functions of the payload bytes, so results are reproducible anywhere.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("mime", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("mean_level", DoubleType()),
        StructField("digest", StringType()),
    ]
)


def synth_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table derived from a text corpus: payload =
    utf-8 bytes of the text (opaque to everything downstream), kind cycles
    by id. Stands in for `spark.read.format('binaryFile')` / an Iceberg
    table with a BINARY column."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
    )


def _decode_real(payload: bytes, kind: str):
    """Real decode path — requires image/audio libs not present here."""
    raise NotImplementedError(
        "real media decode requires PIL/av/soundfile; use fake_decode=True"
    )


def _decode_fake(payload: bytes, kind: str):
    """Deterministic fake decode, per-row reference twin of the vectorized
    kernel in extract_features (tests assert parity): dimensions/frames/
    levels are pure functions of the payload digest + length. Replaced by
    a real decoder behind the same return contract
    (width, height, n_frames, mean_level — mean_level unrounded)."""
    d = hashlib.md5(payload).digest()
    n = len(payload)
    width = 16 + d[0] % 64
    height = 16 + d[1] % 64
    n_frames = 1 if kind == "image" else 1 + d[2] % 32
    mean_level = (sum(payload) / n / 255.0) if n else 0.0
    return width, height, n_frames, mean_level


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Decode/feature-extract via mapInArrow (flat Arrow payload buffers).

    Column pruning matters at scale: the UDF receives only (media_id, kind,
    payload); any metadata-only query upstream never deserializes payload
    bytes (kept in its own parquet column). The fake path is vectorized
    over the Arrow binary value buffer — n_bytes/byte-sum/mean_level are
    flat numpy passes; the only per-row step is md5 (a real media codec is
    per-file C anyway). Payloads must be non-null (synth_media contract).
    """

    def run(batches) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..operators.pack import _binary_spans

        for rb in batches:
            if rb.num_rows == 0:
                continue
            names = rb.schema.names
            pay = rb.column(names.index("payload"))
            if not fake_decode:
                # loud stub: the real decoder needs media libs absent here
                _decode_real(bytes(pay[0].as_py()), "")
            data, starts, ends = _binary_spans(pay)
            n_bytes = (ends - starts).astype(np.int64)
            cs = np.zeros(len(data) + 1, dtype=np.int64)
            np.cumsum(data, out=cs[1:])
            sums = cs[ends] - cs[starts]
            mean_level = np.where(
                n_bytes > 0, sums / np.maximum(n_bytes, 1) / 255.0, 0.0
            )
            mv = memoryview(data)
            raws = [hashlib.md5(mv[s:e]).digest() for s, e in zip(starts, ends)]
            dmat = np.frombuffer(b"".join(raws), dtype=np.uint8).reshape(-1, 16)
            width = (16 + dmat[:, 0] % 64).astype(np.int32)
            height = (16 + dmat[:, 1] % 64).astype(np.int32)
            kind = rb.column(names.index("kind"))
            is_image = pc.equal(kind, "image").to_numpy(zero_copy_only=False)
            n_frames = np.where(
                is_image, 1, 1 + (dmat[:, 2] % 32).astype(np.int32)
            ).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(names.index("media_id")),
                    kind,
                    pa.array(n_bytes),
                    pa.array(width),
                    pa.array(height),
                    pa.array(n_frames),
                    pa.array(mean_level),
                    pa.array([r.hex() for r in raws]),
                ],
                names=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return media.select("media_id", "kind", "payload").mapInArrow(
        run, schema=FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, every_n: int = 8, fake_decode: bool = True) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame index.

    For videos the fake decoder reports n_frames; sampled indices are
    0, every_n, 2*every_n, ... The fake frame payload is a deterministic
    function of (digest, frame_idx) — real decoders substitute actual
    frame grabs behind the same (media_id, frame_idx, frame BINARY)
    contract (the grab itself needs media libs absent from this sandbox).
    """
    feats = extract_features(media, fake_decode=fake_decode)
    frames = feats.filter(F.col("kind") == "video").select(
        "media_id",
        "digest",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
    fake_frame = F.encode(
        F.concat(F.col("digest"), F.lit(":"), F.col("frame_idx").cast("string")),
        "utf-8",
    )
    return frames.select("media_id", "frame_idx", fake_frame.alias("frame"))
