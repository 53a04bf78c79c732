"""Similarity search over embedding columns (array<float>).

Two paths:

  * knn_bruteforce — exact top-k cosine: broadcast the (small) query set
    against the corpus, dot products via zip_with/aggregate (JVM-side
    HigherOrderFunctions, no Python), rank per query with one window.
    At 100 TB this is the per-query-batch baseline: corpus scan x |Q|,
    embarrassingly parallel, zero corpus shuffle.

  * knn_lsh — random-hyperplane LSH: ±1 hyperplanes derived from the shared
    60-bit hash (deterministic, oracle-reproducible), signature = sign
    bits, candidates = bucket-equality join on signature prefix bands,
    then exact cosine only on candidates. The scale path: corpus is
    bucketed once (one shuffle), each query probes its own buckets.

Cosine is computed in float64 with a fixed left-to-right fold so Spark and
the DuckDB oracle produce bit-identical doubles (verified: sequential
list_dot_product == F.aggregate fold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 16
PLANE_BANDS = 4  # 4 bands x 4 bits


def _dvec(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_dvec(a), _dvec(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(
        F.aggregate(_dvec(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, rank, sim) with sim rounded to 6 dp and
    deterministic tie-break on neighbor_id. Queries are broadcast — the
    corpus never shuffles; the only exchange is the per-query top-k
    aggregation, whose input is already reduced map-side by the window
    rank... in practice we use a groupBy(min_by) free pattern: window rank
    over (query) is fine because |Q| x |corpus| rows collapse immediately.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", F.round(cosine("qv", "cv"), 6))
        .select("query_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "sim")
    )


def hyperplane_signature(vec_col, n_planes: int = N_PLANES) -> Column:
    """Deterministic random-hyperplane signature (int, bit per plane).

    Plane p's weight for dimension d is +1 if the shared 60-bit hash of
    "p:d" is even else -1 — reproducible in ANSI SQL, no RNG state. The
    projection is a fixed-order fold over dimensions (bit-stable).
    """
    v = _dvec(vec_col)
    bits = []
    for p in range(n_planes):
        # weight(d) = 1 - 2*(h60('p:d') & 1)  — but h60 of a column index
        # needs the index; use zip_with against the dim-index sequence.
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, i: x
                * (
                    F.lit(1.0)
                    - 2.0
                    * (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.lit(f"pl{p}:"), i.cast("string"))), 1, 15
                            ),
                            16,
                            10,
                        ).cast("long")
                        % 2
                    ).cast("double")
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long")))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    bands: int = PLANE_BANDS,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share at least one exact
    signature band with the query; exact cosine re-ranks candidates."""
    bw = n_planes // bands
    sig = hyperplane_signature(vec_col, n_planes)

    def banded(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias(id_alias),
                F.col(vec_col).alias(vec_alias),
                sig.alias("sig"),
            )
            .select(
                id_alias,
                vec_alias,
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(i).alias("band"),
                                F.shiftright(F.col("sig"), i * bw)
                                .bitwiseAND(F.lit((1 << bw) - 1))
                                .alias("key"),
                            )
                            for i in range(bands)
                        ]
                    )
                ).alias("bk"),
            )
            .select(id_alias, vec_alias, "bk.band", "bk.key")
        )

    cb = banded(corpus, "neighbor_id", "cv")
    qb = banded(queries, "query_id", "qv")
    cand = (
        cb.join(F.broadcast(qb), ["band", "key"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
    )
    scored = cand.withColumn("sim", F.round(cosine("qv", "cv"), 6)).select(
        "query_id", "neighbor_id", "sim"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "sim")
    )
