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


# --- 128-bit -> double casts that agree across engines -----------------
#
# DuckDB's HUGEINT -> DOUBLE conversion is not correctly rounded once
# |v| exceeds ~2^64 (two-limb conversion, double rounding): e.g.
# 6993668924994930343800 casts to 6.993668924994931e+21 while the
# correctly-rounded double (and Spark's DECIMAL(38,0) cast, which IS
# correctly rounded) is 6.99366892499493e+21. Caught by the round-9 sf1
# gate on rolling_corr_28d (4 of 2405 windows landed near a rounding
# midpoint). Below 2^63 both engines use exact hardware conversions.
#
# sql_huge_to_double: DuckDB-side replacement for CAST(x AS DOUBLE) on
# any 128-bit integral value with |v| < 2^93. Splits on 2^40: both limb
# casts are exact (<2^53), the power-of-two multiply is exact, and the
# single final addition rounds once — i.e. the result is CORRECTLY
# rounded and therefore equals Spark's native decimal->double cast, so
# only the oracle needs rewriting.
#
# For |v| up to ~1e35 (OLS determinants) use the _wide pair: three
# 2^32 limbs, two rounded additions — no longer guaranteed correctly
# rounded, but BOTH engines must then spell the identical formula
# (dec_to_double_wide on the Spark side), which pins bit-equality.

_L40 = 1 << 40
_L32 = 1 << 32
_L64 = 1 << 64


def sql_huge_to_double(expr: str) -> str:
    """DuckDB SQL: correctly-rounded 128-bit -> DOUBLE for |v| < 2^93."""
    e = f"CAST(({expr}) AS HUGEINT)"
    a = f"abs({e})"
    return (
        f"((CASE WHEN {e} < 0 THEN -1.0 ELSE 1.0 END) * "
        f"(CAST({a} // {_L40} AS DOUBLE) * {float(_L40)!r} "
        f"+ CAST({a} % {_L40} AS DOUBLE)))"
    )


def sql_huge_to_double_wide(expr: str) -> str:
    """DuckDB SQL: deterministic 128-bit -> DOUBLE for |v| < 2^117.

    Twin of dec_to_double_wide — the two must stay textually parallel
    (same limbs, same association) or bit-equality breaks.
    """
    e = f"CAST(({expr}) AS HUGEINT)"
    a = f"abs({e})"
    return (
        f"((CASE WHEN {e} < 0 THEN -1.0 ELSE 1.0 END) * "
        f"((CAST({a} // {_L64} AS DOUBLE) * {float(_L64)!r} "
        f"+ CAST(({a} // {_L32}) % {_L32} AS DOUBLE) * {float(_L32)!r}) "
        f"+ CAST({a} % {_L32} AS DOUBLE)))"
    )


def dec_to_double_wide(col: Column) -> Column:
    """Spark twin of sql_huge_to_double_wide for DECIMAL(38,0) columns.

    All limb extractions are exact decimal arithmetic (% is exact; the
    divisions have integral quotients); the three limb casts are exact
    doubles (<2^53); the combination is associated exactly as in the
    SQL twin.
    """
    from decimal import Decimal

    l64 = F.lit(Decimal(_L64))  # 2^64 exceeds a long literal
    a = F.abs(col)
    lo = a % F.lit(_L32)
    mid = (a % l64 - lo) / F.lit(_L32)
    hi = (a - a % l64) / l64
    mag = (
        hi.cast("double") * float(_L64) + mid.cast("double") * float(_L32)
    ) + lo.cast("double")
    return F.when(col < 0, -mag).otherwise(mag)
