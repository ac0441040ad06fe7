"""Iterative graph queries round 4: bounded weighted shortest path over
the customer↔supplier trade graph, with a layer-for-layer unrolled SQL
oracle (full value-level gate, like pagerank_trade_graph)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.operators.traversal import sssp_bounded
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_SSSP_SOURCE = 1
_SSSP_ROUNDS = 3


def _sssp_sql(rounds: int) -> str:
    """Unroll Bellman-Ford: each layer keeps every node's min distance
    over paths of <= k edges — bounded by |V| rows per layer, never the
    (exponential) walk count."""
    layers = [
        f"d0 AS (SELECT CAST({_SSSP_SOURCE} AS BIGINT) AS node,"
        " CAST(0 AS BIGINT) AS dist)"
    ]
    for k in range(1, rounds + 1):
        layers.append(
            f"""d{k} AS (
        SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d{k - 1}
            UNION ALL
            SELECT e.dst AS node, d.dist + e.w AS dist
            FROM d{k - 1} d JOIN bi e ON e.src = d.node
        ) u GROUP BY node
    )"""
        )
    joined = ",\n    ".join(layers)
    return f"""
    WITH e0 AS (
        SELECT o_custkey AS src, -l_suppkey AS dst, COUNT(*) AS w
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    bi AS (
        SELECT src, dst, w FROM e0
        UNION ALL
        SELECT dst AS src, src AS dst, w FROM e0
    ),
    {joined}
    SELECT node, dist FROM d{rounds}
    """


@query(
    "sssp_trade_graph",
    sql=_sssp_sql(_SSSP_ROUNDS),
    tags=("graph", "iterative", "sssp"),
)
def sssp_trade_graph(spark, sf_dir):
    """Weighted shortest path (<= 3 relaxation rounds) from customer #1
    over the bidirectional trade graph, edge weight = trade count per
    (customer, supplier) pair — integer weights, so every distance is
    exact and the unrolled-CTE oracle matches bitwise.

    The DataFrame side is operators/traversal.py::sssp_bounded — one
    equi-join + min-aggregate per round, node-id-partitioned, with the
    checkpoint-every-k lineage discipline shared by the whole iterative
    tier. Supplier ids are negated into their own id space (same
    convention as pagerank_trade_graph / bfs_hops_trade).
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    e0 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (-F.col("l_suppkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    bi = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("w"))
    )
    return sssp_bounded(bi, source=_SSSP_SOURCE, rounds=_SSSP_ROUNDS)
