"""Per-document salient terms: tf x corpus-rarity, top-k per doc.

The training-data curation step after dedup/quality is content
indexing: which terms characterize each document against the corpus.
Classic tf-idf weights tf by ln(N/df); this operator's default salience
is the LOG-FREE rational form

    score = tf * N / df

because ln is not correctly-rounded in IEEE — Java's Math.log and C's
libm may differ in the last ulp, which breaks the engine-parity hash
gate this repo holds every operator to (see the determinism discipline
in operators/anomaly.py). The rational form is an exact double for
corpus-scale integers and ORDER-EQUIVALENT to tf*idf per document
whenever tf ties break by df (monotone transform of N/df), so the
selected top-k terms match what log-idf would pick up to tie handling.
``log_idf=True`` switches to ln(N/df) for consumers that want the
textbook weight (excluded from the oracle gate by design).

Scale shape: explode to (doc, term) once, two hash aggregates (tf on
(doc, term), df on term), broadcast the (term, df) side when small or
shuffle-join on term otherwise (AQE decides), then one row_number
window per doc for top-k. Stopwords dropped first — they would
dominate tf while carrying no salience.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import EN_STOPWORDS, ws_tokens


def salient_terms(
    docs: DataFrame,
    k: int = 3,
    log_idf: bool = False,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k salient terms per document by tf * N/df.

    Returns (doc, term, tf, df, score, rank) with the deterministic
    tiebreak (score desc, term asc); score rounded 6dp.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    terms = docs.select(
        F.col(doc_col).alias("doc"),
        F.explode(ws_tokens(text_col)).alias("term"),
    ).filter(~F.lower("term").isin(EN_STOPWORDS))
    tf = terms.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf is one row per (doc, term) already, so document frequency is a
    # count over tf — the old separate distinct() re-shuffled the whole
    # token relation a second time for the same number (guide §2.4)
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(doc_col).distinct().count()
    scored = tf.join(df_, "term")
    if log_idf:
        score = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    else:
        score = F.col("tf") * F.lit(float(n_docs)) / F.col("df")
    w = Window.partitionBy("doc").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.select(
            "doc", "term", "tf", "df", F.round(score, 6).alias("score")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
