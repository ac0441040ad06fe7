"""Graph batch 5: link prediction over the trade graph.

ra_link_prediction scores supplier pairs by the Resource-Allocation
index (Zhou, Lü & Zhang 2009) through common customers — the standard
degree-penalized common-neighbor family (Adamic-Adar's 1/log(deg) twin;
RA's 1/deg is the variant that is exactly computable cross-engine,
since log() is transcendental and not bit-reproducible). Link
prediction is the graph tier's counterpart of the ER/fuzzy-match tier:
"which unconnected pair is most likely a real edge".

Exactness: each common neighbor contributes 1/deg — not dyadic — so
the sum is accumulated as SCALED INTEGERS (2^40 // deg, exact), and
the single float division happens once at the end on the same BIGINT
in both engines (IEEE-identical). The established convention for
order-independent float-free accumulation (see queries/_stable.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query

_RA_SCALE = 1 << 40
# common-neighbor contributions from promiscuous intermediaries are
# both noise (1/deg ~ 0) and the quadratic term in the pair space —
# capping intermediary degree is how production link prediction bounds
# blocks (the ER blocking discipline). Dormant on TPC-H-shaped data
# (per-customer supplier degree saturates around orders-per-customer),
# armed against degenerate hubs.
_RA_MAX_DEGREE = 200


@query(
    "ra_link_prediction",
    sql=f"""
    WITH e AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    deg AS (SELECT c, COUNT(*) AS d FROM e GROUP BY 1),
    pairs AS (
        SELECT a.s AS u, b.s AS v, deg.d AS d
        FROM e a
        JOIN e b ON a.c = b.c AND a.s < b.s
        JOIN deg ON deg.c = a.c
        WHERE deg.d <= {_RA_MAX_DEGREE}
    ),
    scored AS (
        SELECT u, v, COUNT(*) AS common_customers,
               CAST(SUM({_RA_SCALE} // d) AS BIGINT) AS ra_scaled
        FROM pairs GROUP BY 1, 2
    )
    SELECT u AS u_suppkey, v AS v_suppkey, common_customers, ra_scaled,
           CAST(ra_scaled AS DOUBLE) / CAST({_RA_SCALE} AS DOUBLE) AS ra_score
    FROM scored
    ORDER BY ra_scaled DESC, u, v
    LIMIT 20
    """,
    tags=("graph", "link-prediction"),
)
def ra_link_prediction(spark, sf_dir):
    """Top-20 supplier pairs by Resource-Allocation link-prediction
    score through common customers: RA(u,v) = sum over common
    customers z of 1/deg(z), accumulated as exact scaled integers
    (2^40 // deg) with one final double division.

    Scale shape: the blocked self-join keys on the CUSTOMER — the
    low-degree side, whose distinct-supplier degree saturates at
    orders-per-customer regardless of corpus size — so the candidate
    pair space grows LINEARLY with customers (sum of deg^2 with
    bounded deg), never quadratically in suppliers. The degree table
    joins on the same customer key as the self-join (co-partitioned,
    no extra shuffle), hubs past {deg_cap} are dropped before the
    fan-out, the pair aggregation partial-aggregates map-side, and the
    top-20 is a TakeOrdered. This is the dedup tier's shared-blocker
    join shape (operators/dedup.py) applied to link prediction.
    """
    from tvbigdataproject_spark.operators.trade_edges import trade_pairs

    # shared session-scoped pair table (operators/trade_edges.py, r12)
    e = trade_pairs(spark, sf_dir).select(
        F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
    )
    deg = (
        e.groupBy("c")
        .agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") <= _RA_MAX_DEGREE)
    )
    a = e.join(deg, "c")
    b = e.select("c", F.col("s").alias("s2"))
    pairs = a.join(b, "c").where(F.col("s") < F.col("s2"))
    scored = pairs.groupBy(
        F.col("s").alias("u_suppkey"), F.col("s2").alias("v_suppkey")
    ).agg(
        F.count(F.lit(1)).alias("common_customers"),
        F.sum(F.expr(f"{_RA_SCALE} div d")).alias("ra_scaled"),
    )
    return (
        scored.select(
            "u_suppkey",
            "v_suppkey",
            "common_customers",
            "ra_scaled",
            (
                F.col("ra_scaled").cast("double")
                / F.lit(_RA_SCALE).cast("double")
            ).alias("ra_score"),
        )
        .orderBy(F.desc("ra_scaled"), "u_suppkey", "v_suppkey")
        .limit(20)
    )


ra_link_prediction.__doc__ = ra_link_prediction.__doc__.format(
    deg_cap=_RA_MAX_DEGREE
)
