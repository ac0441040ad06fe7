"""Order-stable floating-point aggregates for the oracle suite.

Summing doubles is order-dependent in the last bits; with 32-way (or
1000-way) parallelism Spark's partial-aggregate addition order differs
from any single-threaded oracle, and a result that lands within 1 ULP of
a rounding boundary flips the rounded digit. The fix is to aggregate in
scaled-integer space: round each value to a fixed decimal scale, sum as
BIGINT (exact, associative, order-free), and divide back. Both engines
then produce bit-identical doubles.

At extreme row counts the scaled sum needs a wider accumulator —
sum to DECIMAL(38) instead of BIGINT (Spark: cast to decimal before the
sum; the per-row rounding stays the same). BIGINT here is good to
~9e18 / 10^scale, ample for the bench scales.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_sum(col: Column, scale: int = 2) -> Column:
    """SUM over doubles that is independent of addition order."""
    factor = 10**scale
    return F.sum(F.round(col * factor).cast("long")) / float(factor)


def stable_avg(col: Column, scale: int = 2) -> Column:
    """Order-free AVG: exact scaled sum divided by count."""
    return stable_sum(col, scale) / F.count(F.lit(1))


def sql_stable_sum(expr: str, scale: int = 2) -> str:
    factor = 10**scale
    return f"SUM(CAST(ROUND(({expr}) * {factor}) AS BIGINT)) / {float(factor)}"


def sql_stable_avg(expr: str, scale: int = 2) -> str:
    return f"{sql_stable_sum(expr, scale)} / COUNT(*)"
