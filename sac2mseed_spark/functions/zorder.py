"""Z-order (Morton) interleaved sort keys for multi-dimensional layout.

The tier tables are written partitioned-and-sorted; WHICH sort decides
what a 1000-executor scan can skip. Time-sorted files prune time
predicates perfectly but force a single-conversation query to touch
every recent file; conv-sorted files do the reverse. Bit-interleaving
a 16-bit conversation bucket with a 16-bit hour bucket yields a total
order in which files are tight RECTANGLES in (conv, time) space, so
parquet min/max footer stats prune BOTH predicate families — the same
reason the reference keys its output records by (srcname, starttime)
composite order (sac2mseed.c record sort before write, pack.c framing).

Everything here is whole-stage-codegen integer arithmetic (32 shifts +
masks + one sum chain), reproducible verbatim in DuckDB for the oracle
— no UDF anywhere.

Production use: `df.repartitionByRange(N, zkey).sortWithinPartitions
(zkey)` before the sink write; operators/layout.layout_audit is the
small-side audit proving the clustering win.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import h60

BITS = 16
HOUR_US = 3_600_000_000

# 65536 hour buckets wrap every ~7.5 years; the audit documents the
# wrap (layouts stay valid, locality degrades only across the seam).
_MOD = 1 << BITS


def conv_bucket(conv_col: Column | str) -> Column:
    """16-bit conversation bucket from the engine-portable 60-bit hash."""
    return h60(conv_col) % _MOD


def hour_bucket(ts_us_col: Column | str) -> Column:
    """16-bit hour bucket of an epoch-µs column."""
    c = F.col(ts_us_col) if isinstance(ts_us_col, str) else ts_us_col
    return F.floor(c / float(HOUR_US)).cast("long") % _MOD


def interleave(x: Column, y: Column, bits: int = BITS) -> Column:
    """Morton-interleave two `bits`-bit non-negative ints: x bits land on
    even positions, y bits on odd — a 2*bits-bit z-key."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(add, terms)


def zorder_key(conv_col: Column | str, ts_us_col: Column | str) -> Column:
    """32-bit z-key over (conv bucket, hour bucket)."""
    return interleave(conv_bucket(conv_col), hour_bucket(ts_us_col))


# ---------------------------------------------------------------------
# DuckDB twins (oracle SQL fragments)
# ---------------------------------------------------------------------

def conv_bucket_sql(conv_expr: str) -> str:
    from .hashing import h60_sql

    return f"({h60_sql(conv_expr)} % {_MOD})"


def hour_bucket_sql(ts_us_expr: str) -> str:
    return f"(CAST(floor(({ts_us_expr}) / {HOUR_US}.0) AS BIGINT) % {_MOD})"


def interleave_sql(x_expr: str, y_expr: str, bits: int = BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr}) >> {i}) & 1) << {2 * i}")
        terms.append(f"((({y_expr}) >> {i}) & 1) << {2 * i + 1}")
    return "(" + " + ".join(f"({t})" for t in terms) + ")"
