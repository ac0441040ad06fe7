"""Round-9 regressions: the 128-bit -> double cast portability layer.

DuckDB's HUGEINT -> DOUBLE conversion is not correctly rounded for
|v| > ~2^64 (two-limb conversion, double rounding); Spark's
DECIMAL(38,0) -> DOUBLE is correctly rounded. The round-9 sf1 gate
caught the disagreement on rolling_corr_28d (4 of 2405 windows landed
near a rounding midpoint). queries/_stable.py now provides:

- sql_huge_to_double      DuckDB-side, CORRECTLY rounded for |v| < 2^93
                          (so it equals Spark's native decimal cast)
- sql_huge_to_double_wide / dec_to_double_wide
                          textually-parallel twins for |v| up to ~1e35
                          (OLS determinants) — not guaranteed correctly
                          rounded, but bit-identical across engines
"""

from __future__ import annotations

import random
from decimal import Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from tvbigdataproject_spark.queries._stable import (
    dec_to_double_wide,
    sql_huge_to_double,
    sql_huge_to_double_wide,
)

# the four srr values the sf1 gate caught (and their negations)
OBSERVED = [
    6993668924994930343800,
    7023638003686577798500,
    6903809718924261982500,
    6617507286015466275500,
]


def _wide_reference(v: int) -> float:
    """Pure-python replica of the shared wide 3-limb formula."""
    s = -1.0 if v < 0 else 1.0
    a = abs(v)
    hi = float(a >> 64)
    mid = float((a >> 32) & 0xFFFFFFFF)
    lo = float(a & 0xFFFFFFFF)
    return s * ((hi * float(1 << 64) + mid * float(1 << 32)) + lo)


def test_duckdb_hugeint_cast_is_the_hazard():
    # pin the bug this layer works around: if a DuckDB upgrade fixes
    # the conversion, this starts failing and the helpers can be
    # retired to plain casts.
    con = duckdb.connect()
    wrong = sum(
        con.execute(f"SELECT CAST({v}::HUGEINT AS DOUBLE)").fetchone()[0]
        != float(Decimal(v))
        for v in OBSERVED
    )
    assert wrong == len(OBSERVED)


def test_sql_huge_to_double_correctly_rounded():
    con = duckdb.connect()
    rng = random.Random(42)
    vals = OBSERVED + [-v for v in OBSERVED]
    vals += [rng.randrange(-(10**27), 10**27) for _ in range(2000)]
    vals += [0, 1, -1, 2**53, 2**64, -(2**64), 10**27 - 1]
    for v in vals:
        got = con.execute(f"SELECT {sql_huge_to_double(str(v))}").fetchone()[0]
        assert got == float(Decimal(v)), v


def test_sql_huge_to_double_wide_matches_reference():
    con = duckdb.connect()
    rng = random.Random(7)
    vals = [rng.randrange(-(10**35), 10**35) for _ in range(2000)]
    vals += OBSERVED + [-v for v in OBSERVED] + [0, 1, -1, 10**35 - 1]
    for v in vals:
        got = con.execute(
            f"SELECT {sql_huge_to_double_wide(str(v))}"
        ).fetchone()[0]
        assert got == _wide_reference(v), v


@pytest.mark.usefixtures("spark")
def test_dec_to_double_wide_twin_bitwise(spark):
    rng = random.Random(99)
    vals = [rng.randrange(-(10**35), 10**35) for _ in range(300)]
    vals += OBSERVED + [-v for v in OBSERVED] + [0, 1, -1]
    df = spark.createDataFrame([(str(v),) for v in vals], "s string")
    rows = df.select(
        "s",
        dec_to_double_wide(F.col("s").cast("decimal(38,0)")).alias("w"),
        # also pin that Spark's native decimal cast is correctly
        # rounded (what sql_huge_to_double reproduces)
        F.col("s").cast("decimal(38,0)").cast("double").alias("n"),
    ).collect()
    for r in rows:
        v = int(r["s"])
        assert r["w"] == _wide_reference(v), v
        if abs(v) < 10**27:
            assert r["n"] == float(Decimal(v)), v
