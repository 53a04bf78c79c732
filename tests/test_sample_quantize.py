"""Stratified sampling determinism + embedding quantization invariants."""

import math

from pyspark.sql import functions as F

from sac2mseed_spark.operators.quantize import QMAX, quantize_embeddings
from sac2mseed_spark.operators.sample import (
    SAMPLE_MOD,
    sample_rates_report,
    stratified_sample,
)


def _docs(spark, n=400):
    langs = ["en", "de", "fr"]
    rows = [(i, langs[i % 3], f"text {i}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


RATES = {"en": 0.5, "de": 1.0}


def test_sample_partition_invariant_and_exact_strata(spark):
    docs = _docs(spark)
    a = sorted(r["doc_id"] for r in stratified_sample(docs, "lang", RATES, 0.0).collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(13), "lang", RATES, 0.0).collect()
    )
    assert a == b and len(a) > 0
    kept = stratified_sample(docs, "lang", RATES, 0.0)
    by_lang = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # rate-1.0 stratum keeps everything (ids 1,4,..,397 -> 133 rows),
    # rate-0 default drops everything
    assert by_lang.get("de") == 133
    assert "fr" not in by_lang
    # en keeps a binomial(134, 0.5)-ish subset, strictly between 0 and all
    assert 0 < by_lang["en"] < 134


def test_sample_nested_subset_property(spark):
    docs = _docs(spark)
    wide = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.6}, 0.0).collect()}
    narrow = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.2}, 0.0).collect()}
    assert narrow <= wide


def test_sample_report_consistency(spark):
    docs = _docs(spark)
    rep = {r["lang"]: r for r in sample_rates_report(docs, "lang", RATES, 0.0).collect()}
    assert rep["de"]["n_kept"] == rep["de"]["n_rows"]
    assert rep["fr"]["n_kept"] == 0 and rep["fr"]["realized_rate"] == 0.0
    assert rep["en"]["realized_rate"] == round(
        rep["en"]["n_kept"] / rep["en"]["n_rows"], 6
    )


def test_quantize_invariants(spark):
    vecs = [
        (0, [0.0] * 8),
        (1, [1.0, -1.0, 0.5, -0.5, 0.25, -0.25, 0.125, 0.0]),
        (2, [100.0, 50.0, -100.0, 25.0, 0.0, -25.0, 12.5, 75.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_embeddings(emb).collect()}
    # zero vector: scale 0, all-zero quants, zero error
    assert out[0]["scale"] == 0.0 and out[0]["q_sum"] == 0 and out[0]["mse"] == 0.0
    # extremes hit exactly +-QMAX
    assert out[1]["q_min"] == -QMAX and out[1]["q_max"] == QMAX
    assert out[2]["q_min"] == -QMAX and out[2]["q_max"] == QMAX
    # reconstruction error bounded by (scale/2)^2 per dim
    for vid in (1, 2):
        s = out[vid]["scale"]
        assert out[vid]["mse"] <= (s / 2) ** 2 + 1e-12
    # exact check for vec 1: scale = 1/127; q_i = round(v_i*127) exact ints
    q_expected = [127, -127, 64, -64, 32, -32, 16, 0]
    assert out[1]["q_sum"] == sum(q_expected)
    mse = sum((v - q / 127.0) ** 2 for v, q in zip(vecs[1][1], q_expected)) / 8
    assert math.isclose(out[1]["mse"], round(mse, 6), abs_tol=1e-6)


def test_resample_upsampling_semantics(spark):
    from sac2mseed_spark.operators.sample import stratified_resample

    docs = _docs(spark)
    out = stratified_resample(
        docs, "lang", {"de": 2.5, "en": 0.25}, default_rate=1.0
    )
    rows = out.collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["doc_id"], []).append(r["copy_idx"])
    # every de doc appears 2 or 3 times with dense copy_idx 0..n-1
    de_ids = {r["doc_id"] for r in docs.filter("lang = 'de'").collect()}
    for d in de_ids:
        assert sorted(by_key[d]) == list(range(len(by_key[d])))
        assert len(by_key[d]) in (2, 3)
    # aggregate de expansion close to 2.5x
    n_de = sum(len(by_key[d]) for d in de_ids)
    assert 2.0 * len(de_ids) <= n_de <= 3.0 * len(de_ids)
    # fr (default 1.0): exactly one copy each
    fr_ids = {r["doc_id"] for r in docs.filter("lang = 'fr'").collect()}
    assert all(by_key[d] == [0] for d in fr_ids)
    # en (0.25): strict subset, single copies, same subset as
    # stratified_sample at the same rate
    en_kept = {d for d in by_key if d in
               {r["doc_id"] for r in docs.filter("lang = 'en'").collect()}}
    sub = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.25}, 0.0).collect()}
    assert en_kept == sub
    # rate-1.0 identity and negative-rate guard
    ident = stratified_resample(docs, "lang", {}, default_rate=1.0)
    assert ident.count() == docs.count()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        stratified_resample(docs, "lang", {"en": -0.5})
