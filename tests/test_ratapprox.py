import math

import duckdb
import pytest

from sac2mseed_spark.functions.ratapprox import (
    EPS,
    _A_CLAMP,
    iters_for,
    rat_approx,
    rat_approx_sql,
)

CASES = [
    3.0,
    2.5,
    0.1,
    1.0 / 3.0,
    40.0,
    19.999999999,
    0.0125,
    math.pi,
    math.sqrt(2),
    123.456,
    1.0,
    999.0 / 1000.0,
    7.0 / 3.0,
]


def _py_ratapprox(x: float, max_den: int = 1000) -> tuple[int, int]:
    """Pure-Python mirror of the exact op sequence in rat_approx (the
    scalar oracle for the vectorized/expression implementations)."""
    p0, q0 = 1, 0
    p1, q1 = int(math.floor(x)), 1
    frac = x - math.floor(x)
    done = frac <= EPS
    for _ in range(iters_for(max_den)):
        y = 1.0 / (frac if frac > EPS else 1.0)
        a = min(int(math.floor(y)), _A_CLAMP)
        p2, q2 = a * p1 + p0, a * q1 + q0
        adv = (not done) and q2 <= max_den
        frac2 = (y - float(a)) if adv else frac
        if adv:
            p0, q0, p1, q1 = p1, q1, p2, q2
        done = done or q2 > max_den or (adv and frac2 <= EPS)
        frac = frac2
    return p1, q1


def test_exact_rationals():
    assert _py_ratapprox(3.0) == (3, 1)
    assert _py_ratapprox(2.5) == (5, 2)
    assert _py_ratapprox(0.0125) == (1, 80)
    assert _py_ratapprox(7.0 / 3.0) == (7, 3)


def test_convergent_quality():
    for x in CASES:
        p, q = _py_ratapprox(x)
        assert 1 <= q <= 1000
        # continued-fraction convergents satisfy |x - p/q| < 1/q^2
        assert abs(x - p / q) < 1.0 / (q * q) + 1e-9, (x, p, q)


def test_spark_matches_python(spark):
    df = spark.createDataFrame([(i, x) for i, x in enumerate(CASES)], "id int, x double")
    got = {
        r.id: (r.rat_num, r.rat_den)
        for r in rat_approx(df, "x", 1000).collect()
    }
    for i, x in enumerate(CASES):
        assert got[i] == _py_ratapprox(x), (x, got[i])


def test_duckdb_sql_matches_spark(spark):
    df = spark.createDataFrame([(i, x) for i, x in enumerate(CASES)], "id int, x double")
    got_spark = {
        r.id: (r.rat_num, r.rat_den)
        for r in rat_approx(df, "x", 1000).collect()
    }
    vals = ", ".join(f"({i}, {x!r})" for i, x in enumerate(CASES))
    inner = f"SELECT * FROM (VALUES {vals}) AS t(id, rate_hz)"
    sql = rat_approx_sql(inner, "rate_hz", 1000)
    got_duck = {
        int(i): (int(p), int(q))
        for i, p, q in duckdb.sql(
            f"SELECT id, rat_num, rat_den FROM ({sql})"
        ).fetchall()
    }
    assert got_duck == got_spark


def test_bounded_denominator_prefers_last_convergent(spark):
    # pi convergents: 3, 22/7, 333/106, 355/113, 103993/33102 (> 1000)
    df = spark.createDataFrame([(0, math.pi)], "id int, x double")
    row = rat_approx(df, "x", 1000).collect()[0]
    assert (row.rat_num, row.rat_den) == (355, 113)
    row = rat_approx(df, "x", 100).collect()[0]
    assert (row.rat_num, row.rat_den) == (22, 7)
