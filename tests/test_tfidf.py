"""Salient terms: tf x N/df scoring, top-k, stopword drop, determinism."""

import pytest

from sac2mseed_spark.operators.tfidf import salient_terms


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_salience_prefers_rare_terms(spark):
    d = _docs(
        spark,
        [
            "apple apple banana shared",
            "cherry shared shared",
            "banana shared",
        ],
    )
    out = salient_terms(d, k=1).collect()
    top = {r["doc"]: r["term"] for r in out}
    # doc0: apple tf=2 df=1 -> 6.0 beats banana (1*3/2) and shared (1*3/3)
    # doc1: cherry 1*3/1=3.0 beats shared 2*3/3=2.0
    assert top == {0: "apple", 1: "cherry", 2: "banana"}
    r0 = next(r for r in out if r["doc"] == 0)
    assert r0["tf"] == 2 and r0["df"] == 1 and r0["score"] == 6.0


def test_stopwords_never_selected(spark):
    d = _docs(spark, ["the the the unique", "the of and"])
    out = salient_terms(d, k=5).collect()
    assert {r["term"] for r in out} == {"unique"}


def test_topk_and_tiebreak_deterministic(spark):
    # two terms with identical (tf, df): tie broken by term asc
    d = _docs(spark, ["zed alpha", "zed alpha"])
    out = salient_terms(d, k=1).collect()
    assert all(r["term"] == "alpha" and r["rank"] == 1 for r in out)
    with pytest.raises(ValueError):
        salient_terms(d, k=0)


def test_log_idf_mode(spark):
    import math

    d = _docs(spark, ["rare common", "common"])
    out = salient_terms(d, k=2, log_idf=True).collect()
    r = next(x for x in out if x["term"] == "rare")
    assert math.isclose(r["score"], math.log(2.0), abs_tol=1e-6)
    # df == N -> log score 0
    c = next(x for x in out if x["doc"] == 0 and x["term"] == "common")
    assert c["score"] == 0.0
