"""Live cross-engine probes of sqlexact's exactness AND overflow-symmetry
claims (round-6 ADVICE item 3): in-range results are equal, and past the
documented bounds both engines fail the SAME way (quotients: NULL/NULL;
products: raise/raise) instead of silent-garbage-vs-value."""

from __future__ import annotations

import duckdb
import pytest

from pydatalake_gen2_spark.queries.sqlexact import (
    _DMAX,
    _QMAX,
    f6_half_away,
    idiv,
    wide_mul,
)


@pytest.fixture(scope="module")
def duck_mem():
    return duckdb.connect()


def _both(spark, duck_mem, build):
    """Evaluate `build(duck: bool) -> expr` as one scalar in each engine."""
    s = spark.sql(f"SELECT {build(False)} AS v").collect()[0]["v"]
    d = duck_mem.execute(f"SELECT {build(True)} AS v").fetchone()[0]
    return s, d


@pytest.mark.parametrize(
    "num,den",
    [
        (7, 2), (-7, 2), (7, -2), (-7, -2),  # truncate-toward-zero, 4 signs
        (10**18, 3), (0, 5), (5, 0),  # wide, zero num, zero den
        (_QMAX, 1), (-_QMAX, 1),  # exactly at the BIGINT quotient bound
        (10**37, 10**19),  # wide num, quotient 10^18 well inside BIGINT
    ],
)
def test_idiv_in_range_equal(spark, duck_mem, num, den):
    s, d = _both(spark, duck_mem, lambda duck: idiv(duck, str(num), str(den)))
    if den == 0:
        expect = None
    else:  # exact truncate-toward-zero (int(num/den) would round via float)
        expect = abs(num) // abs(den) * (1 if (num < 0) == (den < 0) else -1)
    assert (s is None and d is None and expect is None) or int(s) == int(d) == expect


@pytest.mark.parametrize(
    "num,den",
    [
        (_QMAX + 1, 1),  # one past the wrap boundary: was silent garbage
        (12345678901234567890, 1),  # the live-verified wrapped case
        (10**37, 1),
        (10**37, 10**18),  # quotient 10^19: just past the BIGINT range
        (-(10**37), 2),
        (10**37, -1),
    ],
)
def test_idiv_past_bound_null_in_both(spark, duck_mem, num, den):
    s, d = _both(spark, duck_mem, lambda duck: idiv(duck, str(num), str(den)))
    assert s is None and d is None, (s, d)


def test_idiv_huge_denominator_null_in_both(spark, duck_mem):
    """|den| > _DMAX: Spark's guard product is unrepresentable (try_multiply
    -> NULL -> fails closed); DuckDB's outer CASE mirrors the same
    boundary exactly. Also proves the DuckDB guard cannot overflow int128."""
    num, den = 10**30, _DMAX + 1
    s, d = _both(spark, duck_mem, lambda duck: idiv(duck, str(num), str(den)))
    assert s is None and d is None, (s, d)
    # ... and exactly AT the boundary both still produce the true quotient
    s2, d2 = _both(spark, duck_mem, lambda duck: idiv(duck, str(10**30), str(_DMAX)))
    assert int(s2) == int(d2) == (10**30) // _DMAX


def test_wide_mul_overflow_raises_in_both(spark, duck_mem):
    big = 10**20
    with pytest.raises(Exception) as se:
        spark.sql(f"SELECT {wide_mul(False, str(big), str(big))} AS v").collect()
    assert "NUMERIC_VALUE_OUT_OF_RANGE" in str(se.value)
    with pytest.raises(Exception) as de:
        duck_mem.execute(f"SELECT {wide_mul(True, str(big), str(big))} AS v").fetchone()
    assert "Out of Range" in str(de.value)


@pytest.mark.parametrize(
    "num,den,expect",
    [
        (1, 3, 333333), (2, 3, 666667), (1, 2, 500000),  # half-up positives
        (-1, 2, -500000), (-1, 3, -333333), (-2, 3, -666667),  # half away
        (0, 7, 0),
    ],
)
def test_f6_half_away_cross_engine(spark, duck_mem, num, den, expect):
    s, d = _both(
        spark, duck_mem, lambda duck: f6_half_away(duck, str(num), str(den))
    )
    assert int(s) == int(d) == expect
