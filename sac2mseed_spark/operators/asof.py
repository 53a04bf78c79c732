"""As-of (temporal) join: latest right row at-or-before each left row.

The reference's adjacency matching (mst_findadjacent,
/root/reference/libmseed/tracelist.c:271-335) finds, for a new record,
the trace segment whose end time is nearest at-or-before the record's
start within a tolerance. Generalized to a relational operator this is
the as-of join — the workhorse temporal primitive (attach the latest
quote to each trade, the latest click to each purchase, the latest
rollup window to each event).

Spark has no native as-of join; the scale-correct formulation is the
union + running-last trick:

  1. tag left rows side=1, right rows side=0 and union on (key, ts)
  2. one window per key ordered by (ts, side, right-tiebreak):
     ``last(right_col, ignorenulls=True)`` over rows unbounded-preceding
     carries the most recent right payload forward onto every left row
  3. keep left rows; enforce the tolerance as a post-filter

Cost shape at 100 TB: exactly ONE shuffle of each input by the join key
(the same partitioning a sort-merge join would do), zero row explosion —
never the naive range-join (left x right per key) whose candidate set is
quadratic in events-per-key. Ordering `side` after ts makes a right row
at the identical timestamp visible to left rows at that instant
(l.ts >= r.ts semantics, matching DuckDB's ASOF JOIN used as the
oracle); ties among right rows at the same (key, ts) are broken by the
highest tiebreak column so the winner is deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    right_payload: list[str],
    tolerance_us: int | None = None,
    tiebreak_col: str | None = None,
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """Attach to each left row the latest right row with
    ``right.ts <= left.ts`` per ``key_cols``.

    ``right_payload`` are the right columns to carry (each lands as
    ``<name><suffix>``); the matched right timestamp always lands as
    ``ts<suffix>``. ``tolerance_us`` drops (inner) or nulls (left)
    matches older than ``left.ts - tolerance_us``. ``tiebreak_col``
    resolves duplicate right (key, ts) rows deterministically by MAX;
    required if the right side can hold such duplicates.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    # right side reduced to key + ts + payload; tie-broken to one row per
    # (key, ts) so "latest" is well-defined in every engine
    rsel = right.select(
        *key_cols, F.col(ts_col).alias("__ts"), *right_payload
    )
    if tiebreak_col is not None:
        w_tie = Window.partitionBy(*key_cols, "__ts").orderBy(
            F.col(tiebreak_col).desc()
        )
        rsel = (
            rsel.withColumn("__rn", F.row_number().over(w_tie))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    payload_tagged = [f"__p_{c}" for c in right_payload]
    r_tagged = rsel.select(
        *key_cols,
        F.col("__ts"),
        F.lit(0).alias("__side"),
        F.col("__ts").alias("__match_ts"),
        *[F.col(c).alias(p) for c, p in zip(right_payload, payload_tagged)],
    )
    l_tagged = left.select(
        "*",
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__match_ts"),
        *[
            F.lit(None).cast(t.dataType).alias(p)
            for p, t in zip(
                payload_tagged,
                [rsel.schema[c] for c in right_payload],
            )
        ],
    )
    # align schemas: union by name with left's extra columns nulled on
    # the right side
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        u.select(
            *[c for c in left.columns],
            F.last("__match_ts", ignorenulls=True)
            .over(w)
            .alias(f"ts{suffix}"),
            *[
                F.last(p, ignorenulls=True).over(w).alias(f"{c}{suffix}")
                for c, p in zip(right_payload, payload_tagged)
            ],
            F.col("__side"),
        )
        .filter(F.col("__side") == 1)
        .drop("__side")
    )
    matched = F.col(f"ts{suffix}").isNotNull()
    if tolerance_us is not None:
        matched = matched & (
            F.col(ts_col) - F.col(f"ts{suffix}") <= F.lit(tolerance_us)
        )
    if how == "inner":
        return out.filter(matched)
    # left: null out payload outside tolerance, keep every left row
    nulled = [
        F.when(matched, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
        for c in right_payload
    ]
    return out.select(
        *[c for c in left.columns],
        F.when(matched, F.col(f"ts{suffix}")).alias(f"ts{suffix}"),
        *nulled,
    )
