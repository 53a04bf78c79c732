"""BM25 document retrieval: top-k corpus documents per query.

The retrieval step of a training-data pipeline (mining documents similar
to a seed set, retrieval-based decontamination, RAG index validation) is
a BM25 scan: score every corpus document against each query's terms and
keep the top-k. Reference analogue: the selection machinery that picks
records matching a source pattern (`/root/reference/sac2mseed.c:448-470`
routes each input through user selections) — here the "selection" is a
ranked free-text match instead of a glob.

Scoring is the LOG-FREE rational BM25 variant. Textbook BM25 is

    score(q, d) = sum_t idf(t) * tf_component(t, d)
    idf(t)          = ln((N - df + 0.5) / (df + 0.5))
    tf_component    = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

ln is not correctly-rounded in IEEE (Java's Math.log and C's libm may
differ in the last ulp), which would break the engine-parity hash gate
this repo holds every operator to — the same reason operators/tfidf.py
is log-free. This operator drops the ln and uses the rational Robertson
ratio directly:

    idf_r(t) = (N - df + 0.5) / (df + 0.5)

With k1 = 1.2, b = 0.75 and avgdl = T/N (T = total post-stopword tokens,
N = corpus size), multiplying tf_component through by 10*T makes every
intermediate an exact int64:

    score_t = 22*tf*T * (2N - 2df + 1)
              -----------------------------------
              ((10*tf + 3)*T + 9*dl*N) * (2df + 1)

i.e. ONE IEEE double division of two exact integers — correctly rounded,
bit-identical in Spark and DuckDB. The per-document score is the sum of
score_t over matched query terms; float addition is order-dependent, so
the sum is a *sequential left-to-right fold in term order* (F.aggregate
over array_sort(collect_list) here; list_reduce over list(... ORDER BY
term) in the oracle) — the same determinism discipline as the
similarity.py dot-product folds.

Scale shape (100 TB): the query-term set is tiny by construction and is
BROADCAST as a semi-join into the corpus scan stage, so only tokens
matching some query term ever reach the (doc, term) aggregate — the
corpus-wide term relation never shuffles at all. Document frequency for
those terms is a count over the tf aggregate (tf is one row per (doc,
term)), the corpus token total folds out of the per-doc length
aggregate (dl) instead of a second full pass, and the final top-k is a
row_number window over |queries| * |candidates| pairs, partitioned by
query. Int64 products hold to ~10^5-token tf x 10^14 total-token
corpora; past that, production computes the same ratio in double (3-ulp
error bound) — the ORDER of results is unchanged for any realistic gap
between candidate scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import EN_STOPWORDS, ws_tokens


def _terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term) pairs: lowercased whitespace tokens minus stopwords."""
    return (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(ws_tokens(text_col)).alias("tok"),
        )
        .select("doc", F.lower("tok").alias("term"))
        .filter(~F.col("term").isin(EN_STOPWORDS))
    )


def bm25_retrieval(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    doc_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k docs per query by the log-free rational BM25 score.

    Returns (query_id, doc_id, n_terms, score, rank); rank 1..k with the
    deterministic tiebreak (score desc, doc_id asc); score rounded 6dp.
    ``exclude_self`` drops candidates whose doc_col equals the query_id
    (for query sets drawn from the corpus itself).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ft = _terms(docs, doc_col, text_col)
    # per-doc post-stopword length needs NO explode/aggregate: it is a
    # map-side count over the row's own token array (value-identical to
    # ft.groupBy(doc).count() for every doc that can reach the join —
    # docs with zero non-stopword tokens match no query term). Persisted
    # so the total-token constant below does not re-tokenize the corpus
    # (values are deterministic — eviction merely recomputes them).
    dl = docs.select(
        F.col(doc_col).alias("doc"),
        F.size(
            F.filter(
                ws_tokens(text_col),
                lambda x: ~F.lower(x).isin(EN_STOPWORDS),
            )
        )
        .cast("long")
        .alias("dl"),
    ).persist()
    qt = (
        _terms(queries, query_id_col, query_text_col)
        .distinct()
        .withColumnRenamed("doc", "query_id")
    )
    # drop every corpus token whose term no query mentions BEFORE the
    # (doc, term) aggregation: the broadcast semi-join runs map-side in
    # the scan stage, so only query-term rows ever shuffle (guide §2.3 /
    # §3.2 — pre-filter the big side; the old shape aggregated and
    # distinct'd the FULL corpus term relation first)
    ftq = ft.join(F.broadcast(qt.select("term").distinct()), "term", "left_semi")
    tf = ftq.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf is one row per (doc, term), so document frequency for the query
    # terms is a count over tf — the corpus-wide distinct() is gone
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # two scalar corpus constants in ONE 1-row aggregate job (dl has a
    # row per docs row, so distinct doc count == old
    # docs.select(doc_col).distinct().count(); total tokens = sum of
    # per-doc lengths, the same number as the old full ft.count() pass)
    row = dl.agg(
        F.sum("dl").alias("t"), F.count_distinct("doc").alias("n")
    ).collect()[0]
    n_tok, n_docs = row["t"] or 0, row["n"]

    t_lit, n_lit = F.lit(int(n_tok)), F.lit(int(n_docs))
    tf_l = F.col("tf").cast("long")
    df_l = F.col("df").cast("long")
    dl_l = F.col("dl").cast("long")
    num = F.lit(22) * tf_l * t_lit * (F.lit(2) * n_lit - F.lit(2) * df_l + F.lit(1))
    den = ((F.lit(10) * tf_l + F.lit(3)) * t_lit + F.lit(9) * dl_l * n_lit) * (
        F.lit(2) * df_l + F.lit(1)
    )
    per_term = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(qt), "term")
        .join(dl, "doc")
        .select(
            "query_id",
            "doc",
            "term",
            (num.cast("double") / den.cast("double")).alias("s"),
        )
    )
    if exclude_self:
        per_term = per_term.filter(F.col("doc") != F.col("query_id"))

    agg = per_term.groupBy("query_id", "doc").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("doc").alias("doc_id"), "n_terms", "score", "rank")
    )
