"""Graph batch 6: landmark-sampled betweenness centrality.

Registered rows-only (no DuckDB oracle): the backward dependency
accumulation is a depth-indexed iteration no non-recursive SQL
expresses, and a recursive-CTE formulation would enumerate paths
(exponential state) rather than Brandes' per-level sums. The value
semantics are pinned instead by tests/test_centrality.py, which checks
the operator bitwise-stable across runs and against an exact
pure-Python Brandes on a hand graph — the same evidence pattern as the
other Spark-internal rows-only queries (learned IVF, LSH)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.operators.centrality import brandes_betweenness
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_BC_LANDMARKS = 3
_BC_HOPS = 4


@query("betweenness_landmarks", sql=None, tags=("graph", "iterative", "centrality"))
def betweenness_landmarks(spark, sf_dir):
    """Brandes dependency scores from the 3 lowest-id customers over
    the bidirectional customer–supplier trade graph (suppliers negated
    into their own id space — the pagerank_trade_graph convention),
    shortest paths capped at 4 hops. This is the Brandes–Pich pivot
    estimator of betweenness: the exact all-sources sweep is O(V*E)
    and never runs at 100 TB; k fixed pivots cost k * depth rounds.

    Scale shape: see operators/centrality.py — forward = multi-source
    BFS carrying exact BIGINT path counts, backward = one
    (landmark, node)-keyed join per depth level with 2^30-scaled
    integer dependency accumulation (float-order-independent, so the
    output is bitwise-stable across runs and parallelism).
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    e0 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (-F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    bi = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    landmarks = (
        bi.where(F.col("src") > 0)
        .select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(_BC_LANDMARKS)
    )
    return brandes_betweenness(bi, landmarks, max_hops=_BC_HOPS)
