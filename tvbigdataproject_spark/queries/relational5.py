"""Relational batch 5: multiset (bag) set operations.

set_union_distinct / set_intersect / set_except cover the DISTINCT
variants (SURVEY.md §2 U-rows); these are their bag-semantics twins —
EXCEPT ALL / INTERSECT ALL keep multiplicities (per value,
max(0, n1-n2) and min(n1, n2) copies), which is what reconciliation
jobs actually need: "how many MORE of each kind does side A have"
loses its meaning under DISTINCT.

The demonstration bags are order priorities split by orderkey parity —
both sides hold every priority value, so the outputs are non-trivial
ONLY under bag semantics (the DISTINCT variants would return ~nothing).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


def _parity_bags(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderkey") % 2 == 1).select(
        F.col("o_orderpriority").alias("priority")
    )
    b = orders.where(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderpriority").alias("priority")
    )
    return a, b


@query(
    "set_except_all",
    sql="""
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderkey % 2 = 1
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderkey % 2 = 0
    """,
    tags=("relational", "setops", "bag"),
)
def set_except_all(spark, sf_dir):
    """Bag difference (EXCEPT ALL) of order priorities between odd- and
    even-keyed orders: per priority, max(0, n_odd - n_even) surviving
    rows — the multiplicity-aware reconciliation the DISTINCT variant
    (set_except) cannot express. Catalyst plans exceptAll as a
    count-aggregate + generate replication, so the shuffle carries one
    row per VALUE, not per input row.
    """
    a, b = _parity_bags(spark, sf_dir)
    return a.exceptAll(b)


@query(
    "set_intersect_all",
    sql="""
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderkey % 2 = 1
    INTERSECT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderkey % 2 = 0
    """,
    tags=("relational", "setops", "bag"),
)
def set_intersect_all(spark, sf_dir):
    """Bag intersection (INTERSECT ALL): per priority, min(n_odd,
    n_even) copies — the matched-volume count between the two halves.
    Same aggregate-then-replicate plan shape as set_except_all.
    """
    a, b = _parity_bags(spark, sf_dir)
    return a.intersectAll(b)
