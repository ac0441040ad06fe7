"""Vector math over array<float>/array<double> embedding columns.

All built from zip_with/aggregate — JVM-side higher-order functions, no
Python round-trip. Inputs are cast to double first so accumulation is
double-precision left-fold, which is deterministic and matches a
sequential SQL sum over the same elements.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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
