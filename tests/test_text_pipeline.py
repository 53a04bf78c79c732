"""Training-pipeline text operators added in round 5: duplicate-cluster
connected components, PII scrub, corpus top-k n-grams.

dedup_clusters' min-label propagation must converge to exactly the
connected components of the pair graph regardless of component shape —
chains (diameter > 1) are the case a single propagation round would get
wrong, so the fixture includes one.
"""

from pyspark.sql import functions as F

from sac2mseed_spark.functions.text import pii_profile, top_ngrams
from sac2mseed_spark.operators.dedup import dedup_clusters


def _chain_corpus(spark):
    """Docs engineered so LSH links them in a CHAIN, not a clique:
    0-1 share most tokens, 1-2 share most tokens, but 0-2 are below the
    verify threshold. Plus an isolated pair (10, 11) and singletons."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    toks = base.split()
    rows = [
        (0, " ".join(toks)),
        (1, " ".join(toks[1:] + ["kilo"])),  # drops 'alpha', adds 'kilo'
        (2, " ".join(toks[2:] + ["kilo", "lima"])),
        (10, "zulu yankee xray whiskey victor uniform tango sierra"),
        (11, "zulu yankee xray whiskey victor uniform tango sierra"),
        (20, "one completely unrelated document body"),
        (21, "another unrelated document entirely different words"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_clusters_chain_converges_to_components(spark):
    docs = _chain_corpus(spark)
    out = dedup_clusters(docs, threshold=0.3).collect()
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in out}
    # the chain 0-1-2 collapses to min id 0 even if edge (0,2) is absent
    assert got[0] == (0, 3) and got[1] == (0, 3) and got[2] == (0, 3)
    assert got[10] == (10, 2) and got[11] == (10, 2)
    # singletons (no near-dup edge) do not appear
    assert 20 not in got and 21 not in got


def test_dedup_clusters_partition_invariant(spark):
    docs = _chain_corpus(spark)
    a = sorted(map(tuple, dedup_clusters(docs, threshold=0.3).collect()))
    b = sorted(
        map(tuple, dedup_clusters(docs.repartition(7), threshold=0.3).collect())
    )
    assert a == b


def test_pii_profile_counts_and_redaction(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at a.b-c@ex-ample.co.uk or x@y.io thanks"),
            (2, "call 555-0123 or 555-012345 tonight"),
            (3, "server at 10.0.3.7 and 192.168.255.1"),
            (4, "clean text with no pii at all"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_profile(docs).collect()}
    assert (rows[1]["n_emails"], rows[1]["n_phones"], rows[1]["n_ips"]) == (2, 0, 0)
    assert (rows[2]["n_emails"], rows[2]["n_phones"], rows[2]["n_ips"]) == (0, 2, 0)
    assert (rows[3]["n_emails"], rows[3]["n_phones"], rows[3]["n_ips"]) == (0, 0, 2)
    assert (rows[4]["n_emails"], rows[4]["n_phones"], rows[4]["n_ips"]) == (0, 0, 0)
    # redacted length reflects placeholder substitution, not the original
    assert rows[2]["redacted_len"] == len("call <PHONE> or <PHONE> tonight")
    assert rows[5]["redacted_len"] == 0


def test_top_ngrams_deterministic_ranking(spark):
    docs = spark.createDataFrame(
        [
            (1, "red fox red fox blue sky"),
            (2, "red fox blue sky blue sky"),
            (3, "tiny"),  # <2 tokens: whole-text fallback shingle
        ],
        "doc_id long, text string",
    )
    out = [(r["ngram"], r["n_occurrences"], r["rank"]) for r in
           top_ngrams(docs, k_top=3, n=2).collect()]
    # totals: 'red fox'=3, 'blue sky'=3, 'fox blue'=2, 'fox red'=1,
    # 'sky blue'=1, 'tiny'=1; the 3-3 tie breaks on the ngram ascending
    assert out == [
        ("blue sky", 3, 1),
        ("red fox", 3, 2),
        ("fox blue", 2, 3),
    ]


def test_top_ngrams_exact(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x")], "doc_id long, text string"
    )
    out = [(r["ngram"], r["n_occurrences"], r["rank"]) for r in
           top_ngrams(docs, k_top=10, n=2).collect()]
    # bigrams: doc1: 'a b','b a','a b','b c'; doc2: 'a b','b x'
    assert out == [
        ("a b", 3, 1),
        ("b a", 1, 2),
        ("b c", 1, 3),
        ("b x", 1, 4),
    ]
