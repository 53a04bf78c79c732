"""Corpus mixture accounting and source overlap: closed-form checks.

Engine-vs-oracle parity at sf0.01 is covered by the driver harness
(`corpus_mix`, `source_overlap`).
"""

from sac2mseed_spark.operators.mix import (
    corpus_mix,
    source_overlap,
    source_quality,
)


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


def test_source_overlap_containment(spark):
    # A: shingles {a b c, b c d}; B: copies doc 1 plus fresh text ->
    # shares both of A's shingles; C: disjoint
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "en", "A"),
            (2, "a b c d", "en", "B"),
            (3, "x y z w v", "en", "B"),
            (4, "p q r", "en", "C"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {
        (r["src_a"], r["src_b"]): r
        for r in source_overlap(docs, k=3).collect()
    }
    ab = got[("A", "B")]
    # A has 2 distinct shingles, B has 2 + 3 = 5; all of A is inside B
    assert (ab["n_a"], ab["n_b"], ab["n_shared"]) == (2, 5, 2)
    assert ab["overlap_share"] == 1.0
    # C shares nothing with anyone -> no rows at all for C
    assert ("A", "C") not in got and ("B", "C") not in got


def test_source_overlap_short_doc_single_shingle(spark):
    # docs under k tokens fall back to the whole text as one shingle
    docs = spark.createDataFrame(
        [(1, "hi there", "en", "A"), (2, "hi there", "en", "B")],
        "doc_id long, text string, lang string, source string",
    )
    rows = source_overlap(docs, k=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src_a"], r["src_b"], r["n_shared"]) == ("A", "B", 1)
    assert r["overlap_share"] == 1.0


def test_source_quality_macro_ratios(spark):
    docs = spark.createDataFrame(
        [
            # A: 4 tokens, 1 punct char of 10 chars, 1 stopword, short
            (1, "the cat, ok", "en", "A"),
            # A: 6 tokens, 0 punct of 26 chars, 0 stopwords, short
            (2, "one two three four five six", "en", "A"),
            # B: empty text
            (3, "", "en", "B"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {r["source"]: r for r in source_quality(docs, short_tokens=10).collect()}
    a = got["A"]
    assert (a["n_docs"], a["sum_tokens"]) == (2, 9)
    assert a["tokens_per_doc"] == 4.5
    assert a["punct_share"] == round(1 / (11 + 27), 6)
    assert a["stopword_share"] == round(1 / 9, 6)
    assert a["short_doc_share"] == 1.0
    b = got["B"]
    # empty text: zero chars/tokens -> NULL shares, still a short doc
    assert b["sum_tokens"] == 0
    assert b["punct_share"] is None and b["stopword_share"] is None
    assert b["short_doc_share"] == 1.0
