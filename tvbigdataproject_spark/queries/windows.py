"""Window-function queries (SURVEY.md §2.5 W1/W2).

Window specs always carry a key tiebreak in the ORDER BY so frames are
total orders — at 100 TB a non-total window order is a nondeterminism
bug, not a style issue. Partition keys are the natural entity keys
(segment, customer), so the single window shuffle is also the only
shuffle in each plan.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "window_topk_per_group",
    sql="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn
    FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer)
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_topk_per_group(spark, sf_dir):
    """Top-k per group via row_number — the scalable top-k idiom (beats
    collect+sort by never materializing a group)."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        read_table(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


@query(
    "window_running_sum",
    sql="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_spend
    FROM orders
    """,
    tags=("window",),
)
def window_running_sum(spark, sf_dir):
    """Running aggregate over a rows frame."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w) / 100.0).alias(
            "running_spend"
        ),
    )


@query(
    "window_lag_delta",
    sql="""
    SELECT o_custkey, o_orderkey,
           LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev_price,
           o_totalprice - COALESCE(LAG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0.0) AS delta
    FROM orders
    """,
    tags=("window",),
)
def window_lag_delta(spark, sf_dir):
    """lag + frame-free offset function."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        prev.alias("prev_price"),
        (F.col("o_totalprice") - F.coalesce(prev, F.lit(0.0))).alias("delta"),
    )


@query(
    "window_rank_dense",
    sql="""
    SELECT p_brand, p_partkey, p_retailprice,
           RANK()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS drnk
    FROM part
    """,
    tags=("window",),
)
def window_rank_dense(spark, sf_dir):
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return read_table(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )
