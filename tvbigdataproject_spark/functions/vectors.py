"""Vector math over array<float>/array<double> embedding columns.

Two kernels with bit-identical results:

- ``dot_product``/``l2_norm``/``cosine_similarity`` — zip_with/aggregate
  higher-order functions. JVM-side, zero Python, but HOFs are
  CodegenFallback in Spark: every element of every pair pays interpreted
  eval, so per-pair cost dominates quadratic pair joins.
- ``cosine_arrow`` — an Arrow-batched pandas_udf over numpy. One Python
  fence per stage, then ~memory-bandwidth vector math. This is the hot
  path for pair-quadratic plans (near-dup pairs, brute-force top-k).

Bit-exactness contract: both kernels accumulate as a *sequential
left-to-right float64 fold* (the semantics of ``aggregate()`` and of a
chained ``a+b+c`` in ANSI SQL, which the DuckDB oracles spell out
term-by-term). numpy's own reductions use pairwise summation whenever
the reduced axis is contiguous and would drift in the last ulp, so the
fold is an explicit per-dimension loop of vectorized adds over the
``(dim, n)`` batch — strict left fold per column by construction — and
``cosine_arrow`` matches the HOF form bitwise (covered by
tests/test_similarity.py, including the single-row-batch case).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    ad = _as_double(a)
    sq = F.aggregate(F.zip_with(ad, ad, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return F.sqrt(sq)


def cosine_similarity(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom).otherwise(F.lit(0.0))


def _seq_fold_columns(m: np.ndarray) -> np.ndarray:
    """Reduce a (dim, n) float64 array over axis 0 as a strict
    sequential left fold per column — one vectorized ``acc += row`` per
    dimension, exactly ``aggregate()``'s fold order, so the result is
    bitwise-equal to Spark's HOF accumulation.

    Deliberately NOT np.add.reduce: numpy switches to pairwise
    summation whenever the reduced axis is memory-contiguous, which for
    a C-contiguous (dim, n) input happens exactly when n == 1 — so
    single-row Arrow batches (tiny per-task partitions produce them)
    would drift in the last ulp while larger batches matched. The
    explicit loop costs dim vectorized adds per batch and has the fold
    order guaranteed by construction, independent of numpy internals.
    ``m[0] + 0.0`` seeds the fold as ``0.0 + x0`` does (normalizing a
    would-be -0.0) and copies, so ``m`` is never mutated."""
    acc = m[0] + 0.0
    for row in m[1:]:
        acc += row
    return acc


# DoubleType() (not the DDL string "double") so decoration is
# session-free: string return types are parsed via the active
# SparkContext, which does not exist yet at import time.
@pandas_udf(DoubleType())
def cosine_arrow(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine over fixed-dimension, non-null embedding
    columns; bitwise-equal to ``cosine_similarity`` (see module
    docstring for the fold-order argument).

    Each Arrow batch is stacked to a (dim, n) C-contiguous pair of
    float64 matrices (float32 -> float64 widening is exact); dot and
    both squared norms are outer-axis sequential folds; the final
    expression mirrors the HOF form op-for-op: ``dot / (sqrt(na2) *
    sqrt(nb2))`` with a 0.0 fallback when the denominator is not > 0.
    """
    if len(a) == 0:
        return pd.Series(np.empty(0, dtype=np.float64))
    at = np.ascontiguousarray(np.stack(a.to_numpy()).T, dtype=np.float64)
    bt = np.ascontiguousarray(np.stack(b.to_numpy()).T, dtype=np.float64)
    dot = _seq_fold_columns(at * bt)
    denom = np.sqrt(_seq_fold_columns(at * at)) * np.sqrt(_seq_fold_columns(bt * bt))
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.where(denom > 0, dot / denom, 0.0)
    return pd.Series(cos)
