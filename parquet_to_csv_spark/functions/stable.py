"""Cross-engine-stable float aggregate expressions.

Problem: ``round(avg(x), 4)`` is not reproducible across engines (or
even across partition counts) when x carries 2-decimal values — true
averages frequently land exactly on ``.xxxx5`` ties, where the rounding
of the float differs by summation order *and* by rounding convention
(Spark rounds the double's shortest decimal representation, DuckDB/C
round the binary value — verified divergent on 147.8275/2).

Fix: leave float space before the tie can matter.
``sum(x)`` of ≤2-decimal values is within float jitter of an exact
multiple of 0.01, so ``round(sum*100)`` recovers the exact integer
cents. ``floor(cents * 100 / count)`` is then a pure integer result
(the double division of exact ints is correctly rounded, and a true
non-integer quotient can never sit within one ulp of an integer for
count ≤ ~1e9) — identical in every engine. Result: the average
truncated to 4 decimals, deterministic everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def stable_avg_2dp(sum_col: Column, count_col: Column) -> Column:
    """avg of a ≤2-decimal column, truncated to 4dp, engine-stable."""
    cents = F.round(sum_col * 100, 0)
    return F.floor(cents * 100 / count_col) / F.lit(10000.0)


def stable_avg_int(sum_col: Column, count_col: Column) -> Column:
    """avg of an integer-valued column, truncated to 4dp, engine-stable."""
    return F.floor(sum_col * 10000 / count_col) / F.lit(10000.0)


def exact_units(col: Column, dp: int) -> Column:
    """Exact integer units of a true-``dp``-decimal double expression.

    ``floor(x·10^dp + 0.5)``: when the expression's true value carries
    exactly ``dp`` decimals (e.g. price(2dp) × (1−discount(2dp)) is an
    exact 4-decimal rational), the computed double sits within ~1e-7 of
    the integer ``x·10^dp``, so the +0.5/floor recovers it exactly — a
    per-row, order-independent map both engines evaluate identically.
    Returns LongType (Spark ``floor`` on double)."""
    return F.floor(col * F.lit(float(10**dp)) + F.lit(0.5))


def stable_sum_2dp(col: Column, dp: int) -> Column:
    """Engine-stable ``round(sum(x), 2)`` for x an exact dp-decimal expr.

    Why not ``round(sum(x), 2)`` directly: a true-4dp sum (revenue =
    price×(1−disc)) is a multiple of 1e-4, which lands EXACTLY on a
    ``.xx5`` rounding boundary with probability ~1/50 per output row —
    there the float summation order (per engine, per partition count)
    decides which side the computed double falls on, and the hash gate
    flips. Fix: sum exact integer units (error-free long addition in
    any order), then round to cents in pure integer arithmetic
    (half-up), then one exact division back to double. Every step is
    order- and engine-independent.

    Overflow headroom: long units at 10^6 scale cap at ~9.2e12 in
    value-units — fine to ~sf10; past that swap the unit sum to
    ``sum(units.cast("decimal(38,0)"))`` (exact, unbounded) at the same
    call sites.
    """
    t = F.sum(exact_units(col, dp))
    if dp <= 2:
        return t / F.lit(float(10**dp))
    div = 10 ** (dp - 2)
    t2 = t + F.lit(div // 2)
    # exact long division t2 div `div`: subtract the remainder, then the
    # double division of a multiple of `div` is within ulp(t2)/div < 0.5
    # of the exact integer quotient — round(·, 0) recovers it exactly.
    m = F.pmod(t2, F.lit(div))
    cents = F.round((t2 - m) / F.lit(float(div)), 0)
    return cents / F.lit(100.0)


# DuckDB twins (for oracle SQL): keep in sync with the above.
def duck_avg_2dp(sum_expr: str, count_expr: str = "count(*)") -> str:
    return f"floor(round(({sum_expr}) * 100) * 100 / ({count_expr})) / 10000.0"


def duck_avg_int(sum_expr: str, count_expr: str = "count(*)") -> str:
    return f"floor(({sum_expr}) * 10000 / ({count_expr})) / 10000.0"


def duck_units(expr: str, dp: int) -> str:
    """DuckDB twin of :func:`exact_units` (floor returns DOUBLE there)."""
    return f"CAST(floor(({expr}) * {10**dp} + 0.5) AS BIGINT)"


def duck_sum_2dp(expr: str, dp: int) -> str:
    """DuckDB twin of :func:`stable_sum_2dp`.

    The Spark side divides via ``pmod`` — i.e. FLOOR division — but
    DuckDB's ``//`` truncates toward zero, so the two disagreed by one
    cent on NEGATIVE sums (first surfaced by Q9's profit, which mixes
    signs). The ``(x % d + d) % d`` normalization reproduces pmod
    exactly; for positive sums the result is unchanged."""
    t = f"sum({duck_units(expr, dp)})"
    if dp <= 2:
        return f"({t} / {float(10**dp)})"
    div = 10 ** (dp - 2)
    t2 = f"({t} + {div // 2})"
    m = f"((({t2}) % {div} + {div}) % {div})"
    return f"(((({t2}) - {m}) / {div}) / 100.0)"
