"""Exact cross-engine integer/decimal SQL arithmetic (round-6 hardening).

Why this module exists: the driver's round-5 red row (g51_anova_f) was a
rendered DECIMAL(38,0) of ~2^61 — past float64's exact integer range.
Two independent failure modes live there:

  (a) DuckDB's int128 -> double cast is NOT correctly rounded (1-ulp
      drift on ~70-bit values; observed live on g39's moments), so a
      shared-text `CAST(wide_decimal AS DOUBLE)` can differ per engine
      even on EQUAL inputs, and a terminal ROUND(6) only shrinks — never
      closes — the window where that ulp crosses a rounding boundary.
  (b) An external canonicalizer that coerces one engine's DECIMAL column
      to float64 (e.g. a pandas hasher) renders the two engines
      differently even when the values are equal.

The discipline, enforced registry-wide by tests/test_correctness.py:
rendered columns must be float64-exact (integers < 2^53, true doubles,
strings, bools, dates); anything wider is rendered as STRING or pushed
through the EXACT integer helpers below. Ratios become exact micro-unit
integer divisions; decimal->double conversions that must stay double go
through _dec2dbl's deterministic hi/lo split.

Every helper emits one of two dialect spellings (Spark / DuckDB), because
exact wide-integer DIVISION has no shared-text form: Spark's is
DECIMAL(38,0) `DIV` (exact while the QUOTIENT fits BIGINT; silently wraps
past 2^63 — verified live), DuckDB's is HUGEINT `//` (DuckDB's decimal
`//` promotes to DOUBLE — verified live — so hugeint is its only exact
integer-division path; its decimal *products* are hugeint-exact and cap
at width 38, same as Spark's). Both spellings truncate toward zero for
both signs (verified: -7/2 = -3 in both, and `%` keeps the dividend's
sign in both).

Overflow symmetry past the documented magnitude bounds (round-6 ADVICE
item 3), all verified live under this repo's session (ANSI mode ON —
Spark 4's default; get_spark does not override it):

- PRODUCTS (wide_mul): Spark DECIMAL(38,0) overflow RAISES
  (NUMERIC_VALUE_OUT_OF_RANGE) and DuckDB HUGEINT overflow RAISES
  (Out of Range) — already a symmetric, loud signal. No guard needed.
- QUOTIENTS (idiv): Spark `DIV` silently WRAPS the BIGINT quotient past
  2^63 EVEN IN ANSI MODE (verified: 12345678901234567890 DIV 1 returns
  a wrapped negative), while DuckDB `//` returns the true int128
  quotient — silent wrong-value vs silent right-value. idiv therefore
  fences the quotient range in BOTH dialects: NULL whenever
  |num| > (2^63-1)*|den|, via an exact integer comparison (Spark:
  try_multiply so the guard itself cannot raise; DuckDB: nested CASE —
  lazily evaluated, verified — so the guard product never overflows
  int128). In-range results are unchanged; past the bound both engines
  now yield NULL instead of garbage-vs-value.
"""

from __future__ import annotations

_QMAX = 2**63 - 1  # largest BIGINT quotient Spark's DIV can represent
# Spark's guard product QMAX*|den| is representable while |den| <= _DMAX
# (DECIMAL(38,0) caps at 10^38-1); past it try_multiply yields NULL and
# the guard fails closed. DuckDB mirrors the same boundary explicitly.
_DMAX = (10**38 - 1) // _QMAX


def wide_mul(duck: bool, *terms: str) -> str:
    """Product of integer terms in the dialect's exact wide-integer type.

    Spark: DECIMAL(38,0) products (precision caps at 38, scale 0 — exact
    while |value| < 10^38; overflow RAISES under this repo's ANSI-on
    session, NULL only in non-ANSI mode). DuckDB: HUGEINT (int128,
    |value| < ~1.7e38, overflow raises; DuckDB decimal products would
    also be exact, but hugeint composes with `//`). Overflow is thus
    raise-vs-raise — symmetric and loud (module docstring). Callers
    document their magnitude bounds.
    """
    cast = "HUGEINT" if duck else "DECIMAL(38,0)"
    return " * ".join(f"CAST(({t}) AS {cast})" for t in terms)


def idiv(duck: bool, num: str, den: str) -> str:
    """Exact integer division, truncating toward zero, in each dialect.

    The denominator is NULLIF-fenced: division by zero yields NULL in
    both engines instead of Spark-NULL-vs-DuckDB-error divergence.

    The QUOTIENT range is fenced symmetrically (module docstring,
    "Overflow symmetry"): Spark's DIV silently wraps a quotient past
    2^63 even in ANSI mode, so both dialects yield NULL whenever
    |num| > (2^63-1)*|den| — the exact boundary where the wrap begins.
    Both guards are pure integer comparisons (no doubles, no new raise
    paths): Spark uses try_multiply (NULL -> guard fails closed when
    |den| > _DMAX makes the guard product unrepresentable), DuckDB
    nests CASE so the int128 guard product is only evaluated when
    |den| <= _DMAX (the same boundary — the dialects agree everywhere).
    """
    if duck:
        q = f"(CAST(({num}) AS HUGEINT) // CAST(NULLIF(({den}), 0) AS HUGEINT))"
        nh = f"ABS(CAST(({num}) AS HUGEINT))"
        dh = f"ABS(CAST(({den}) AS HUGEINT))"
        return (
            f"(CASE WHEN {dh} <= CAST({_DMAX} AS HUGEINT) THEN "
            f"(CASE WHEN {nh} <= CAST({_QMAX} AS HUGEINT) * {dh} "
            f"THEN {q} END) END)"
        )
    nd = f"ABS(CAST(({num}) AS DECIMAL(38,0)))"
    dd = f"ABS(CAST(({den}) AS DECIMAL(38,0)))"
    return (
        f"(CASE WHEN {nd} <= try_multiply(CAST({_QMAX} AS DECIMAL(38,0)), {dd}) "
        f"THEN (({num}) DIV NULLIF(({den}), 0)) END)"
    )


def f6_half_away(duck: bool, num: str, den: str) -> str:
    """ratio*10^6 as an exact BIGINT, rounded half away from zero.

    f6 = (2*num*10^6 + sign(num)*den) intdiv (2*den) with den > 0; with
    truncate-toward-zero division this is half-up for num >= 0 and
    half-away-from-zero for num < 0 (SQL ROUND semantics). num/den are
    wide-integer expressions built by wide_mul. Render the statistic as
    CAST(f6 AS DOUBLE) / CAST(1000000 AS DOUBLE): f6 < 2^53 makes the
    cast exact and the one IEEE divide identical in both engines.
    """
    two_num = f"2 * ({num}) * 1000000"
    adj = f"(CASE WHEN ({num}) < 0 THEN -({den}) ELSE ({den}) END)"
    return f"CAST({idiv(duck, f'{two_num} + {adj}', f'2 * ({den})')} AS BIGINT)"


def dec2dbl(duck: bool, x: str) -> str:
    """Deterministic wide-integer-decimal -> DOUBLE conversion.

    Replaces `CAST(x AS DOUBLE)` on scale-0 decimals whose values can
    exceed 2^53 (where DuckDB's int128->double cast is not correctly
    rounded). Split x = hi*10^15 + lo with hi, lo BIGINT: both int64 ->
    double casts are correctly rounded in both engines, 10^15 = 2^15*5^15
    so hi*1e15 is an exact double while |hi| < 2^53/5^15 ~ 295000 (i.e.
    |x| < ~2.9e20 — document the bound at the call site; beyond that the
    product rounds once, still DETERMINISTICALLY, since both engines run
    the identical IEEE mul/add on identical exact inputs), and the final
    add rounds once identically. Within the exact-product range the
    result is the CORRECTLY ROUNDED double of x — strictly better than
    the native cast.

    Truncate-toward-zero DIV/% keep hi and lo self-consistent for
    negative x (hi*10^15 + lo == x holds for both signs in both
    dialects).
    """
    if duck:
        hx = f"CAST(CAST(({x}) AS HUGEINT) // CAST(1000000000000000 AS HUGEINT) AS BIGINT)"
        lx = f"CAST(CAST(({x}) AS HUGEINT) % CAST(1000000000000000 AS HUGEINT) AS BIGINT)"
    else:
        hx = f"CAST(({x}) DIV CAST(1000000000000000 AS DECIMAL(38,0)) AS BIGINT)"
        lx = f"CAST(({x}) % CAST(1000000000000000 AS DECIMAL(38,0)) AS BIGINT)"
    return (
        f"(CAST({hx} AS DOUBLE) * CAST(1000000000000000 AS DOUBLE)"
        f" + CAST({lx} AS DOUBLE))"
    )
