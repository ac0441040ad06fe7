"""Graph batch 11 (r12): directional structure of the trade/returns
relationship —

- graph_reciprocity  edge reciprocity of the directed trade-returns
                     graph: forward edges are customer -> supplier for
                     kept line items, reverse edges supplier ->
                     customer for returned ones (the scc/bowtie
                     convention, graph7.py) — reciprocity = share of
                     directed edges whose reverse also exists, the
                     standard directed-graph mixing statistic (a
                     reciprocal pair here is a relationship with BOTH
                     kept and returned trade, i.e. a genuinely two-way
                     interaction).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_GR_EDGES = """
    e AS (
        SELECT a, b FROM (
            SELECT DISTINCT o_custkey AS a, -l_suppkey AS b
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_returnflag <> 'R'
            UNION
            SELECT DISTINCT -l_suppkey AS a, o_custkey AS b
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_returnflag = 'R'
        ) WHERE a <> b
    )
"""


@query(
    "graph_reciprocity",
    sql=f"""
    WITH {_GR_EDGES},
    rec AS (
        SELECT COUNT(*) AS n_recip FROM e
        WHERE EXISTS (SELECT 1 FROM e r WHERE r.a = e.b AND r.b = e.a)
    )
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST(n_recip AS BIGINT) AS n_reciprocal,
           CAST(n_recip AS DOUBLE)
               / CAST((SELECT COUNT(*) FROM e) AS DOUBLE) AS reciprocity
    FROM rec
    """,
    tags=("graph", "mixing"),
)
def graph_reciprocity(spark, sf_dir):
    """Reciprocity of the directed trade-returns graph: forward =
    customer->supplier over kept line items, reverse = supplier->
    customer over returned ones (the scc_trade_returns orientation),
    r = |E ∩ E^T| / |E| over the LOOP-FREE edge set (self-loops are
    excluded — a loop is trivially its own reverse and the id-space
    collision at node 0 can mint one) — the classic directed-mixing
    statistic; a
    reciprocal dyad is a relationship carrying trade in BOTH states,
    exactly the two-way cores the bowtie/SCC family decomposes.

    Exactness: both counts are exact BIGINTs over the distinct edge
    set; the ratio is one shared-text double division.

    Scale shape: two filtered scans of the li⋈orders join build the
    distinct edge set (digest-free keyed dedup); the reciprocal count
    is ONE self left-semi equi-join on the reversed key pair —
    |E|-bounded, nothing all-pairs; output is one row.
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    base = li.join(orders, li.l_orderkey == orders.o_orderkey)
    fwd = (
        base.where(F.col("l_returnflag") != "R")
        .select(
            F.col("o_custkey").alias("a"), (-F.col("l_suppkey")).alias("b")
        )
    )
    rev = (
        base.where(F.col("l_returnflag") == "R")
        .select(
            (-F.col("l_suppkey")).alias("a"), F.col("o_custkey").alias("b")
        )
    )
    # a <> b: the synthetic data carries both custkey 0 and suppkey 0,
    # so the negation convention can mint a (0,0) self-loop — and a
    # self-loop is trivially its own reverse, which would bias r
    # upward; standard reciprocity is defined loop-free.
    e = (
        fwd.unionByName(rev)
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    recip = e.join(
        e.select(F.col("a").alias("b"), F.col("b").alias("a")),
        ["a", "b"],
        "left_semi",
    )
    tot = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    nr = recip.agg(F.count(F.lit(1)).cast("long").alias("n_reciprocal"))
    return (
        tot.crossJoin(F.broadcast(nr))
        .select(
            "n_edges",
            "n_reciprocal",
            (
                F.col("n_reciprocal").cast("double")
                / F.col("n_edges").cast("double")
            ).alias("reciprocity"),
        )
    )
