"""Corpus mixture accounting: closed-form share checks.

Engine-vs-oracle parity at sf0.01 is covered by the driver harness
(`corpus_mix`).
"""

from sac2mseed_spark.operators.mix import corpus_mix


def test_corpus_mix_shares(spark):
    docs = spark.createDataFrame(
        [
            (1, "one two three", "en", "web"),
            (2, "four five", "en", "web"),
            (3, "sechs sieben acht", "de", "web"),
            (4, "  ", "de", "books"),
            (5, "nine ten", "en", "books"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {
        (r["lang"], r["source"]): r for r in corpus_mix(docs).collect()
    }
    assert set(got) == {
        ("en", "web"), ("de", "web"), ("de", "books"), ("en", "books"),
    }
    ew = got[("en", "web")]
    assert (ew["n_docs"], ew["n_tokens"]) == (2, 5)
    assert ew["doc_share"] == 0.4
    assert ew["token_share"] == 0.5  # 5 of 10 total tokens
    blank = got[("de", "books")]
    assert (blank["n_docs"], blank["n_tokens"]) == (1, 0)
    assert blank["token_share"] == 0.0
    assert sum(r["doc_share"] for r in got.values()) == 1.0
    assert sum(r["token_share"] for r in got.values()) == 1.0
