"""Engine-portable deterministic hashing.

The reference keys everything on a composed srcname string
(/root/reference/libmseed/traceutils.c:1239-1282) and relies on stable C
semantics; our dedup/LSH operators need a hash that (a) is stable across
Spark versions/JVMs and (b) is *reproducible in ANSI SQL* so the DuckDB
oracle can recompute it. md5 satisfies both; we take the first 15 hex chars
(60 bits) so the value always fits a signed BIGINT without sign mangling.

Spark side: conv(substr(md5(s),1,15),16,10) cast long
DuckDB side: CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)
(verified equal: H('hello') = 419982666956583591 in both engines)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60


def h60(col: Column | str, seed: str = "") -> Column:
    """Deterministic 60-bit hash of a string column (optionally seeded)."""
    c = F.col(col) if isinstance(col, str) else col
    if seed:
        c = F.concat(c, F.lit("#" + seed))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str, seed: str = "") -> str:
    """The identical hash in DuckDB SQL (for oracle queries)."""
    if seed:
        expr = f"concat({expr}, '#{seed}')"
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"
