"""Glob translator + override splice — ms_globmatch / sac2mseed forced
fields semantics (selection.c:604-700, sac2mseed.c:318-337)."""

import re

import pytest

from sac2mseed_spark.functions.selections import glob_to_regex, override_sql

# (glob, candidate, should_match) — the ms_globmatch grammar cases
GLOB_CASES = [
    ("*", "anything", True),
    ("", "", True),
    ("", "x", False),
    ("conv_1", "conv_1", True),
    ("conv_1", "conv_12", False),  # anchored: no partial match
    ("conv_?", "conv_7", True),
    ("conv_?", "conv_77", False),
    ("conv_1*", "conv_1234", True),
    ("conv_1*", "conv_2234", False),
    ("c?n*_[0-3]?", "con_v_25", True),
    ("[abc]x", "bx", True),
    ("[abc]x", "dx", False),
    ("[a-c]x", "bx", True),
    ("[a-c]x", "dx", False),
    ("[^abc]x", "dx", True),
    ("[^abc]x", "ax", False),
    ("[]5]z", "]z", True),  # ']' first in set is literal
    ("[]5]z", "5z", True),
    ("[]5]z", "6z", False),
    ("a.b", "a.b", True),  # regex specials in glob are literal
    ("a.b", "axb", False),
    ("a+b(c)", "a+b(c)", True),
    ("x[", "x[", True),  # unterminated set -> literal '['
    ("IU_ANMO_*_[BH]H?", "IU_ANMO_00_BHZ", True),
    ("IU_ANMO_*_[BH]H?", "IU_ANMO_00_LHZ", False),
]


@pytest.mark.parametrize("glob,s,want", GLOB_CASES)
def test_glob_to_regex(glob, s, want):
    assert bool(re.search(glob_to_regex(glob), s)) is want


def test_glob_regex_is_anchored():
    assert glob_to_regex("ab").startswith("^") and glob_to_regex("ab").endswith("$")


# override splice semantics, checked via DuckDB (same engine as the oracle)
OVERRIDE_CASES = [
    ("CONV_....", "conv_123", "CONV_123"),
    ("R...", "user", "Rser"),
    ("R...", "assistant", "Rssistant"),  # tail beyond override kept
    ("forced", "checkout", "forcedut"),
    ("forced", None, None),  # NULL stays NULL
    ("X.....", "ab", "Xb"),  # dots beyond original emit nothing
]


@pytest.mark.parametrize("ov,orig,want", OVERRIDE_CASES)
def test_override_sql_semantics(ov, orig, want):
    import duckdb

    lit = "NULL" if orig is None else f"'{orig}'"
    got = duckdb.sql(
        f"SELECT {override_sql('c', ov)} FROM (SELECT {lit} AS c)"
    ).fetchone()[0]
    assert got == want


def test_override_col_matches_sql(spark):
    """Spark override_col and the SQL splice agree on every case."""
    from pyspark.sql import functions as F

    from sac2mseed_spark.functions.selections import override_col

    rows = [(o,) for _, o, _ in OVERRIDE_CASES]
    df = spark.createDataFrame(rows, "c string")
    for ov, orig, want in OVERRIDE_CASES:
        got = (
            df.filter(F.col("c").eqNullSafe(F.lit(orig)))
            .select(override_col("c", ov))
            .collect()[0][0]
        )
        assert got == want, (ov, orig, got, want)
