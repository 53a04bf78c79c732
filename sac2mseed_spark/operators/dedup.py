"""Deduplication operators for document corpora.

Four strategies, all shuffle-conscious for the 100 TB case:

  * exact            — hash-groupBy on the text (one shuffle on a 60-bit
                       digest, never on the full text bytes)
  * ngram_jaccard    — exact Jaccard over word-shingle sets, but candidate
                       pairs come from an inverted shingle->doc join, so
                       cost is Σ per-shingle pairs, not |docs|² (a doc pair
                       with zero shared shingles is never materialized)
  * minhash_lsh      — shingle -> k minhashes -> banded buckets ->
                       bucket-join candidates -> exact verify. The scale
                       path: shuffle volume is docs x k signature rows.
  * simhash          — 60-bit bit-majority fingerprint; near-dups = equal
                       fingerprint (hamming 0) or banded hamming match.

The verify step mirrors the reference's decode-side Xn check philosophy
(candidates are cheap and optimistic; an exact predicate confirms them,
/root/reference/libmseed/unpackdata.c:556-561).

Every operator returns deterministic, SQL-reproducible results (DuckDB
oracle in __spark_entry__.py) — hashes via functions.hashing.h60.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60
from ..functions.text import shingles, ws_tokens

MINHASH_K = 12  # signature length
MINHASH_BAND = 2  # rows per band -> 6 bands
SIMHASH_BITS = 32


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct text: keeper = min id, plus group size.

    GroupBy on the digest (fixed 8 bytes) rather than raw text keeps the
    shuffle narrow; the min(text) per digest resolves the (astronomically
    unlikely, but checkable) digest collision deterministically.
    """
    return (
        docs.select(F.col(id_col), F.col(text_col), h60(text_col).alias("text_h60"))
        .groupBy("text_h60")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("keep_id", "n_dups", "text_h60")
    )


def _shingle_sets(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, shingle_h) distinct — the inverted-index base relation."""
    return (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(shingles(text_col, k)).alias("sh"),
        )
        .select("doc", h60("sh").alias("sh_h"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs (a < b) with shingle-set Jaccard >= threshold.

    Self-join on shingle hash -> count shared shingles per pair; set sizes
    broadcast back. |inter| and |union| are integers, so the final
    jaccard = inter / (|A|+|B|-inter) is one float division — bit-stable.
    """
    ss = _shingle_sets(docs, id_col, text_col, k)
    sizes = ss.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    pairs = (
        ss.alias("l")
        .join(ss.alias("r"), "sh_h")
        .filter(F.col("l.doc") < F.col("r.doc"))
        .groupBy(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        pairs.join(F.broadcast(sizes.withColumnRenamed("doc", "a").withColumnRenamed("sz", "sza")), "a")
        .join(F.broadcast(sizes.withColumnRenamed("doc", "b").withColumnRenamed("sz", "szb")), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "jaccard")
    )
    return out


def minhash_signatures(
    docs: DataFrame,
    k: int = MINHASH_K,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, sig_idx, minhash): k seeded min-hashes of the shingle set.

    Computed as ONE aggregation: explode shingles, build the k-vector of
    seeded hashes per shingle JVM-side, elementwise-min across the group
    (zip_with inside a reduce-style agg) — no per-seed pass over the data.
    """
    sh = docs.select(
        F.col(id_col).alias("doc"), F.explode(shingles(text_col, shingle_k)).alias("sh")
    )
    vec = F.array(*[h60("sh", seed=f"mh{j}") for j in range(k)])
    per_doc = (
        sh.select("doc", vec.alias("hv"))
        .groupBy("doc")
        .agg(
            F.array(*[F.min(F.element_at("hv", j + 1)) for j in range(k)]).alias("sig")
        )
    )
    return per_doc.select(
        "doc", F.posexplode("sig").alias("sig_idx", "minhash")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = MINHASH_K,
    band_rows: int = MINHASH_BAND,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash+LSH candidates, then exact-Jaccard verified.

    band bucket key = (band_idx, hash of the band's minhash row vector);
    docs sharing any bucket become candidates. Verification recomputes true
    shingle Jaccard only for candidates — the classic
    shingle→minhash→band→bucket-join pipeline.
    """
    sigs = minhash_signatures(docs, k, shingle_k, id_col, text_col)
    bands = (
        sigs.withColumn("band", F.floor(F.col("sig_idx") / band_rows).cast("int"))
        .groupBy("doc", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("sig_idx", "minhash"))),
                    lambda x: x["minhash"].cast("string"),
                ),
                ":",
            ).alias("bucket")
        )
    )
    cand = (
        bands.alias("l")
        .join(bands.alias("r"), ["band", "bucket"])
        .filter(F.col("l.doc") < F.col("r.doc"))
        .select(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
        .distinct()
    )
    ss = _shingle_sets(docs, id_col, text_col, shingle_k)
    sizes = ss.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cand.join(ss.withColumnRenamed("doc", "a").withColumnRenamed("sh_h", "hl"), "a")
        .join(ss.withColumnRenamed("doc", "b").withColumnRenamed("sh_h", "hr"), "b")
        .filter(F.col("hl") == F.col("hr"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(F.broadcast(sizes.withColumnRenamed("doc", "a").withColumnRenamed("sz", "sza")), "a")
        .join(F.broadcast(sizes.withColumnRenamed("doc", "b").withColumnRenamed("sz", "szb")), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): bit-majority fingerprint over token hashes.

    One explode + one groupBy: per token the 32-bit hash contributes +1/-1
    per bit position; fingerprint bit b set iff the signed sum > 0.
    """
    toks = docs.select(
        F.col(id_col).alias("doc"), F.explode(ws_tokens(text_col)).alias("tok")
    ).select("doc", h60("tok").alias("th"))
    bit_sums = toks.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    fp = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return bit_sums.select(F.col("doc").alias(id_col), fp.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance <= max_hamming.

    Candidates via 4-band LSH on the fingerprint (8-bit bands): any pair
    within hamming 3 of a 32-bit fingerprint shares at least one exact
    band (pigeonhole), so banding is lossless for max_hamming <= 3.
    """
    fps = simhash(docs, id_col, text_col)
    n_bands = 4
    bw = SIMHASH_BITS // n_bands
    banded = fps.select(
        F.col(id_col).alias("doc"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), i * bw)
                        .bitwiseAND(F.lit((1 << bw) - 1))
                        .alias("key"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "simhash", "bk.band", "bk.key")
    cand = (
        banded.alias("l")
        .join(banded.alias("r"), ["band", "key"])
        .filter(F.col("l.doc") < F.col("r.doc"))
        .select(
            F.col("l.doc").alias("a"),
            F.col("r.doc").alias("b"),
            F.col("l.simhash").alias("ha"),
            F.col("r.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
