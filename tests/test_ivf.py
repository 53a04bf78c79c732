import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from sac2mseed_spark.operators.ivf import knn_ivf, train_centroids
from sac2mseed_spark.operators.similarity import knn_bruteforce


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _pairs(df):
    return {
        (r.query_id, r.neighbor_id): (r.rank, r.sim) for r in df.collect()
    }


def test_single_list_equals_bruteforce(emb):
    """With one centroid and one probe every corpus vector is a candidate,
    so IVF must reproduce the exact brute-force top-k bit-for-bit."""
    q = emb.filter(F.col("vec_id") % 50 == 0)
    exact = _pairs(knn_bruteforce(emb, q, k=5))
    ivf = _pairs(knn_ivf(emb, q, k=5, n_centroids=1, nprobe=1))
    assert ivf == exact


def test_ivf_shape_and_scores(emb):
    q = emb.filter(F.col("vec_id") % 50 == 0)
    res = knn_ivf(emb, q, k=5, n_centroids=8, nprobe=2).collect()
    assert res, "no IVF results"
    by_q = {}
    for r in res:
        assert r.query_id != r.neighbor_id
        assert -1.0 - 1e-9 <= r.sim <= 1.0 + 1e-9
        by_q.setdefault(r.query_id, []).append((r.rank, r.sim, r.neighbor_id))
    for rows in by_q.values():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        sims = [r[1] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert len(rows) <= 5


def test_ivf_sims_match_exact_for_common_pairs(emb):
    """Any (query, neighbor) pair IVF scores must carry the same cosine the
    exact path computed — the approximation prunes candidates, never
    changes scores."""
    q = emb.filter(F.col("vec_id") % 50 == 0)
    exact_all = _pairs(knn_bruteforce(emb, q, k=100))
    ivf = _pairs(knn_ivf(emb, q, k=5, n_centroids=8, nprobe=2))
    for pair, (_, sim) in ivf.items():
        if pair in exact_all:
            assert sim == exact_all[pair][1]


def test_ivf_deterministic(emb):
    q = emb.filter(F.col("vec_id") % 50 == 0)
    a = _pairs(knn_ivf(emb, q, k=5))
    b = _pairs(knn_ivf(emb, q, k=5))
    assert a == b


@pytest.fixture(scope="module")
def clustered(spark):
    """8 well-separated direction clusters in 16 dims, 64 vectors each —
    deterministic closed-form (no RNG). The medoid seed (lowest 8 ids)
    falls entirely inside cluster 0, so it is a bad index for this data;
    a trained index must recover the true clusters."""
    dims, n_clusters, per = 16, 8, 64
    rows = []
    for c in range(n_clusters):
        base = [0.0] * dims
        base[2 * c] = 1.0  # orthogonal cluster directions
        for i in range(per):
            v = list(base)
            # small deterministic within-cluster jitter on other axes
            v[(2 * c + 1) % dims] = 0.15 * math.sin(1.0 + 7 * i)
            v[(2 * c + 3) % dims] = 0.15 * math.cos(2.0 + 5 * i)
            rows.append((c * per + i, [float(x) for x in v]))
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    return spark.createDataFrame(rows, schema).cache()


def _recall_at_k(approx, exact, k):
    ex = {}
    for (q, n), (rank, _) in exact.items():
        if rank <= k:
            ex.setdefault(q, set()).add(n)
    got = {}
    for (q, n), (rank, _) in approx.items():
        got.setdefault(q, set()).add(n)
    hits = sum(len(got.get(q, set()) & ns) for q, ns in ex.items())
    return hits / sum(len(ns) for ns in ex.values())


def test_trained_centroids_beat_medoid_seed_on_clustered_data(clustered):
    """train_centroids (sampled spherical k-means) must recover clusters
    the medoid seed cannot: recall@k strictly improves and reaches ~1.0
    on this separable fixture, while the default path stays the
    oracle-deterministic medoid seed (unchanged results)."""
    q = clustered.filter(F.col("vec_id") % 16 == 0)
    exact = _pairs(knn_bruteforce(clustered, q, k=5))
    medoid = _pairs(knn_ivf(clustered, q, k=5, n_centroids=8, nprobe=1))
    trained = train_centroids(clustered, n_centroids=8, n_iters=10)
    kmeans = _pairs(
        knn_ivf(clustered, q, k=5, n_centroids=8, nprobe=1, centroids=trained)
    )
    r_medoid = _recall_at_k(medoid, exact, 5)
    r_kmeans = _recall_at_k(kmeans, exact, 5)
    assert r_kmeans >= r_medoid
    assert r_kmeans >= 0.95, f"trained recall only {r_kmeans}"
    # trained centroids are unit-norm synthetic points with ids 0..7
    cids, M, norms = trained
    assert list(cids) == list(range(8))
    assert all(abs(n - 1.0) < 1e-9 for n in norms)


def test_train_centroids_deterministic(clustered):
    a = train_centroids(clustered, n_centroids=8, n_iters=5)
    b = train_centroids(clustered, n_centroids=8, n_iters=5)
    assert (a[1] == b[1]).all()
