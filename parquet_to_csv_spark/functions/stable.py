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


# DuckDB twins (for oracle SQL): keep in sync with the above.
def duck_avg_2dp(sum_expr: str, count_expr: str = "count(*)") -> str:
    return f"floor(round(({sum_expr}) * 100) * 100 / ({count_expr})) / 10000.0"


def duck_avg_int(sum_expr: str, count_expr: str = "count(*)") -> str:
    return f"floor(({sum_expr}) * 10000 / ({count_expr})) / 10000.0"
