import pytest
from pyspark.sql import functions as F

from sac2mseed_spark.operators.ivf import knn_ivf
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
