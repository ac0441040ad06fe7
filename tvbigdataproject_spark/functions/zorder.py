"""Z-order (Morton) interleaving for multi-dimensional data layout.

Z-ordering is the data-layout lever behind multi-column pruning at
lakehouse scale (Delta/Iceberg OPTIMIZE ZORDER BY): sort/partition by
the interleaved key and a range of z-values covers a bounded rectangle
in (x, y) space, so min/max file statistics prune BOTH dimensions —
a single-column sort prunes only its leading column.

The interleave is pure 64-bit integer bit-twiddling (the standard
"spread bits with magic masks" sequence), so it runs inside
whole-stage codegen on Spark and replays exactly in any SQL engine
with shifts — the oracle rebuilds it stage by stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SPREAD_STAGES = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread16(v: Column) -> Column:
    """Spread a 16-bit value's bits to the even bit positions of a
    32-bit lane (b15..b0 -> bit positions 30,28,...,0)."""
    v = v.cast("long")
    for shift, mask in _SPREAD_STAGES:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def z_interleave16(x: Column, y: Column) -> Column:
    """32-bit Morton code of two 16-bit keys: x on even bits, y odd."""
    return spread16(x).bitwiseOR(F.shiftleft(spread16(y), 1))


def spread16_sql_ctes(x_expr: str, y_expr: str, keys: str) -> str:
    """The same spread pipeline as chained SQL CTE stages (sx/sy built
    from ``x``/``y`` over 4 stages; final CTE ``zed`` adds ``zval``).
    ``keys`` is the column list to carry through each stage."""
    stages = [
        f"pts AS (SELECT {keys}, {x_expr} AS x, {y_expr} AS y FROM orders)",
        f"s0 AS (SELECT {keys}, x, y, x AS sx, y AS sy FROM pts)",
    ]
    for i, (shift, mask) in enumerate(_SPREAD_STAGES):
        stages.append(
            f"s{i + 1} AS (SELECT {keys}, x, y, "
            f"(sx | (sx << {shift})) & {mask} AS sx, "
            f"(sy | (sy << {shift})) & {mask} AS sy FROM s{i})"
        )
    stages.append(
        f"zed AS (SELECT {keys}, x, y, sx | (sy << 1) AS zval FROM s4)"
    )
    return ",\n    ".join(stages)
