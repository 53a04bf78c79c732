"""SAX symbolization (Symbolic Aggregate approXimation) of tier series.

Lin/Keogh/Lonardi/Chiu's SAX (DMKD 2007, public) z-normalizes a series
and maps each value to a small alphabet using equiprobable Gaussian
breakpoints, turning numeric series into strings that support
similarity search, motif discovery, and cheap indexing — the natural
bridge between this engine's tier series and its text/dedup operators
(a SAX word is a fingerprint the MinHash/SimHash family can consume).

This implements the per-window variant (word length = series length,
no PAA averaging): alphabet size 4, breakpoints (−0.6745, 0, 0.6745)
— the standard normal quartiles.

Float-determinism design (operators/anomaly.py discipline): the
z-scores come from exact integer conv totals (n, Σx, Σx²) through one
canonical expression mirrored in the DuckDB oracle, so the doubles —
and therefore every breakpoint comparison — are bit-identical across
engines. The word itself is an ORDER-DEFINED aggregation: Spark sorts
the collected (window, symbol) structs before joining (sort_array on
the struct orders by the integer window first), DuckDB uses
string_agg(... ORDER BY window) — identical strings.

Scale shape: one shuffle by conv; the full-partition totals are window
aggregates over that exchange and the word is a groupBy over the same
key, so the plan is a single exchange reused. Word length is bounded
by windows-per-conv (the 1h tier over month-scale retention keeps this
in the hundreds; at 100 TB the collect_list per key is bounded by the
same retention policy that bounds the tier itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# standard-normal quartile breakpoints for alphabet size 4 (SAX paper
# Table 3); exact decimal literals parsed identically by both engines
BREAKPOINTS = (-0.6745, 0.0, 0.6745)
ALPHABET = ("a", "b", "c", "d")


def sax_words(
    tier: DataFrame,
    value_col: str = "sum_tokens",
    key_col: str = "conv_id",
    order_col: str = "window_start_us",
    min_windows: int = 4,
) -> DataFrame:
    """One SAX word per key over its z-normalized observed windows.

    Returns (key, n_windows, sax_word) for keys with at least
    ``min_windows`` windows and nonzero variance; symbols 'a' (lowest
    quartile) through 'd' (highest).
    """
    if min_windows < 2:
        raise ValueError(f"min_windows must be >= 2, got {min_windows}")

    x = F.col(value_col).cast("long")
    wp = Window.partitionBy(key_col)
    staged = tier.select(
        F.col(key_col),
        F.col(order_col),
        x.alias("__x"),
    ).select(
        key_col,
        order_col,
        "__x",
        F.count("__x").over(wp).alias("__n"),
        F.sum("__x").over(wp).alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).over(wp).alias("__ss"),
    )
    n = F.col("__n").cast("double")
    m = F.col("__s").cast("double") / n
    var = F.col("__ss").cast("double") / n - m * m
    z = (F.col("__x").cast("double") - m) / F.sqrt(var)
    b1, b2, b3 = BREAKPOINTS
    sym = (
        F.when(z < F.lit(b1), F.lit(ALPHABET[0]))
        .when(z < F.lit(b2), F.lit(ALPHABET[1]))
        .when(z < F.lit(b3), F.lit(ALPHABET[2]))
        .otherwise(F.lit(ALPHABET[3]))
    )
    pts = staged.filter(
        (F.col("__n") >= min_windows) & (var > 0)
    ).select(
        key_col,
        F.col("__n").alias("__nw"),
        F.struct(F.col(order_col).alias("w"), sym.alias("s")).alias("__p"),
    )
    return pts.groupBy(key_col).agg(
        F.max("__nw").alias("n_windows"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("__p")), lambda p: p["s"]
            ),
            "",
        ).alias("sax_word"),
    )
