"""Embedding quantization for ANN index compaction.

Symmetric per-vector int8 scalar quantization: scale = max|v| / 127,
q_i = round(v_i / scale) clamped to [-127, 127]. At 100 TB an embedding
column dominates storage (64 float32 = 256 B/row); int8 + one float
scale is 68 B — the standard 3.7x index shrink IVF/HNSW deployments take
before product quantization.

Everything is expression-level over the array column (transform /
zip_with / aggregate — Catalyst HOFs, no Python), and the error fold is
SEQUENTIAL (F.aggregate folds left-to-right) so the reconstruction-MSE
float matches DuckDB's list fold bit-for-bit — the same defined-fold-
order discipline as the cosine kernels in operators/similarity.py.

The query surface reports per-vector scalars (scale, mse, q_sum/min/max)
rather than the int8 array itself: integers summarize the quantized
vector exactly (sum/min/max are order-free), keeping the oracle compare
on scalar columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QMAX = 127


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector int8 quantization stats.

    Returns (id, dims, scale, q_sum, q_min, q_max, mse): scale rounded
    6dp for the report (the fold uses the unrounded value), mse = mean
    squared reconstruction error folded in array order. All-zero vectors
    quantize to all-zero with scale 0 (dequant defined as 0 * q = 0).
    """
    v = _as_double(vec_col)
    absmax = F.array_max(F.transform(v, F.abs))
    scale = F.when(absmax > 0, absmax / QMAX).otherwise(F.lit(0.0))
    q = F.transform(
        v,
        lambda x: F.least(
            F.greatest(
                F.when(scale > 0, F.round(x / scale, 0)).otherwise(F.lit(0.0)),
                F.lit(-float(QMAX)),
            ),
            F.lit(float(QMAX)),
        ).cast("int"),
    )
    err = F.zip_with(v, q, lambda x, qi: x - qi.cast("double") * scale)
    sse = F.aggregate(err, F.lit(0.0), lambda acc, e: acc + e * e)
    dims = F.size(v)
    return emb.select(
        F.col(id_col),
        dims.alias("dims"),
        F.round(scale, 6).alias("scale"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.array_min(q).alias("q_min"),
        F.array_max(q).alias("q_max"),
        F.round(sse / dims, 6).alias("mse"),
    )
