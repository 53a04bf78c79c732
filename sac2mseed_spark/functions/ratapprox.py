"""Rational sample-rate approximation — ms_ratapprox analogue (F4).

Reference: ms_ratapprox (/root/reference/libmseed/genutils.c:1455-1521)
finds the best rational num/den for a double sample rate with a bounded
denominator, via continued-fraction convergents. Here the same recurrence
runs as a FIXED-LENGTH unrolled chain of pure Catalyst expressions —
whole-stage codegen, zero Python — and the identical op sequence is
emitted as unrolled ANSI-SQL CTE steps (rat_approx_sql) so the DuckDB
oracle reproduces every IEEE double op bit-for-bit.

Semantics: returns the last continued-fraction convergent p/q of x with
q <= max_den (reference-INSPIRED, not bit-matched to the reference:
ms_ratapprox additionally bounds the NUMERATOR by maxval and rounds each
partial quotient with a precision offset, so results differ for
x > max_den and for near-integer partial quotients; convergents are best
rational approximations in the |x - p/q| < 1/q^2 sense either way).
Preconditions: x > 0 and x < ~1e9. Overflow safety: once the state
freezes, the per-step multiplicand is zeroed (a_eff below) so frozen
rows never keep multiplying; on live steps q1 <= max_den and the 1e6
quotient clamp bound p2 <= ~1e6 * max_den * x < 2^63 for in-precondition
x — the same arithmetic on both engines, so Spark (wrapping) and DuckDB
(range-checked) can never diverge on an overflow path.

Termination: a convergent step with fractional remainder <= EPS (1e-12)
freezes the state — both engines evaluate the same clamp and the same
guarded 1/frac (inactive rows divide by 1.0), so no Inf/overflow paths
are ever taken on either side.

Unroll length: denominators of successive convergents grow at least as
fast as Fibonacci numbers, so iters_for(max_den) = first n with
F(n+2) > max_den steps always reach the bound (16 for max_den=1000).
One withColumns per step (temps inlined) keeps the driver-side plan
build/analysis linear in the unroll length — Catalyst will not collapse
the per-step Projects because each state column is referenced several
times by the next step, so codegen cost stays linear too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPS = 1e-12
_A_CLAMP = 1_000_000  # int64 headroom; binds only after q2 > max_den froze state

_STATE = ["_p0", "_q0", "_p1", "_q1", "_frac", "_done"]


def iters_for(max_den: int) -> int:
    """Unroll length: first n where the n-th Fibonacci-growth step pushes
    the convergent denominator past max_den (q_k >= F(k+1))."""
    a, b, n = 0, 1, 0
    while b <= max_den:
        a, b = b, a + b
        n += 1
    return n + 1  # one spare step for the EPS-freeze bookkeeping


def rat_approx(
    df: DataFrame,
    x_col: str,
    max_den: int = 1000,
    out_num: str = "rat_num",
    out_den: str = "rat_den",
) -> DataFrame:
    """Append (out_num, out_den): continued-fraction approximation of
    df[x_col] with denominator <= max_den. Expression-only (codegen)."""
    x = F.col(x_col).cast("double")
    a0 = F.floor(x)
    df = df.withColumns(
        {
            "_p0": F.lit(1).cast("long"),
            "_q0": F.lit(0).cast("long"),
            "_p1": a0,
            "_q1": F.lit(1).cast("long"),
            "_frac": x - a0.cast("double"),
        }
    )
    df = df.withColumn("_done", F.col("_frac") <= F.lit(EPS))
    p0, q0, p1, q1 = F.col("_p0"), F.col("_q0"), F.col("_p1"), F.col("_q1")
    frac, done = F.col("_frac"), F.col("_done")
    for _ in range(iters_for(max_den)):
        y = F.lit(1.0) / F.when(frac > F.lit(EPS), frac).otherwise(F.lit(1.0))
        a = F.least(F.floor(y), F.lit(_A_CLAMP).cast("long"))
        # frozen rows multiply by 0, not by a stale quotient: keeps every
        # inactive step's p2/q2 at p0/q0 instead of growing toward int64
        # wrap (where Spark wraps silently but DuckDB raises)
        a_eff = F.when(done, F.lit(0).cast("long")).otherwise(a)
        p2 = a_eff * p1 + p0
        q2 = a_eff * q1 + q0
        adv = (~done) & (q2 <= F.lit(max_den))
        frac2 = F.when(adv, y - a.cast("double")).otherwise(frac)
        df = df.withColumns(
            {
                "_p0": F.when(adv, p1).otherwise(p0),
                "_q0": F.when(adv, q1).otherwise(q0),
                "_p1": F.when(adv, p2).otherwise(p1),
                "_q1": F.when(adv, q2).otherwise(q1),
                "_frac": frac2,
                "_done": done
                | (q2 > F.lit(max_den))
                | (adv & (frac2 <= F.lit(EPS))),
            }
        )
    return df.withColumns({out_num: p1, out_den: q1}).drop(*_STATE)


def rat_approx_sql(
    inner: str,
    x_expr: str = "rate_hz",
    max_den: int = 1000,
    out_num: str = "rat_num",
    out_den: str = "rat_den",
) -> str:
    """ANSI-SQL twin of rat_approx: wraps ``inner`` (a SELECT producing
    x_expr plus passthrough columns) in iters_for(max_den) unrolled CTE
    steps with the exact same op order, so DuckDB's doubles match Spark's
    bit-for-bit."""
    iters = iters_for(max_den)
    steps = [
        f"""r0 AS (
  SELECT *, CAST(1 AS BIGINT) AS _p0, CAST(0 AS BIGINT) AS _q0,
         CAST(floor({x_expr}) AS BIGINT) AS _p1, CAST(1 AS BIGINT) AS _q1,
         {x_expr} - floor({x_expr}) AS _frac,
         ({x_expr} - floor({x_expr})) <= {EPS!r} AS _done
  FROM ({inner})
)"""
    ]
    for i in range(1, iters + 1):
        steps.append(
            f"""r{i} AS (
  SELECT * EXCLUDE (_y, _a, _a_eff, _p2, _q2, _adv, _frac2,
                    _p0, _q0, _p1, _q1, _frac, _done),
         CASE WHEN _adv THEN _p1 ELSE _p0 END AS _p0,
         CASE WHEN _adv THEN _q1 ELSE _q0 END AS _q0,
         CASE WHEN _adv THEN _p2 ELSE _p1 END AS _p1,
         CASE WHEN _adv THEN _q2 ELSE _q1 END AS _q1,
         _frac2 AS _frac,
         (_done OR (_q2 > {max_den}) OR (_adv AND _frac2 <= {EPS!r})) AS _done
  FROM (
    SELECT *, CASE WHEN _adv THEN _y - CAST(_a AS DOUBLE) ELSE _frac END AS _frac2
    FROM (
      SELECT *, (NOT _done) AND (_q2 <= {max_den}) AS _adv
      FROM (
        SELECT *, _a_eff * _p1 + _p0 AS _p2, _a_eff * _q1 + _q0 AS _q2
        FROM (
          SELECT *, CASE WHEN _done THEN CAST(0 AS BIGINT) ELSE _a END AS _a_eff
          FROM (
            SELECT *, least(CAST(floor(_y) AS BIGINT), {_A_CLAMP}) AS _a
            FROM (
              SELECT *, 1.0 / (CASE WHEN _frac > {EPS!r} THEN _frac ELSE 1.0 END) AS _y
              FROM r{i - 1}
            )
          )
        )
      )
    )
  )
)"""
        )
    final = (
        f"SELECT * EXCLUDE (_p0, _q0, _p1, _q1, _frac, _done), "
        f"_p1 AS {out_num}, _q1 AS {out_den} FROM r{iters}"
    )
    return "WITH " + ",\n".join(steps) + "\n" + final
