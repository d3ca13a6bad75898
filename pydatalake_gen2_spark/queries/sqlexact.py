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
"""

from __future__ import annotations


def wide_mul(duck: bool, *terms: str) -> str:
    """Product of integer terms in the dialect's exact wide-integer type.

    Spark: DECIMAL(38,0) products (precision caps at 38, scale 0 — exact
    while |value| < 10^38, overflow -> NULL in non-ANSI mode). DuckDB:
    HUGEINT (int128, |value| < ~1.7e38, overflow raises; DuckDB decimal
    products would also be exact, but hugeint composes with `//`).
    Callers document their magnitude bounds.
    """
    cast = "HUGEINT" if duck else "DECIMAL(38,0)"
    return " * ".join(f"CAST(({t}) AS {cast})" for t in terms)


def idiv(duck: bool, num: str, den: str) -> str:
    """Exact integer division, truncating toward zero, in each dialect.

    The denominator is NULLIF-fenced: division by zero yields NULL in
    both engines instead of Spark-NULL-vs-DuckDB-error divergence.
    Spark callers must keep the QUOTIENT within BIGINT (DIV wraps past
    2^63 — verified live).
    """
    if duck:
        return f"(CAST(({num}) AS HUGEINT) // CAST(NULLIF(({den}), 0) AS HUGEINT))"
    return f"((({num}) DIV NULLIF(({den}), 0)))"


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
