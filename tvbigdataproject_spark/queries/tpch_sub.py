"""TPC-H subquery-decorrelation shapes: Q4, Q13, Q15, Q18, Q21, Q22.

The reference's pipelines stop at joins + aggregates; these six add the
classic *correlated subquery* shapes a warehouse engine must decorrelate,
each written as the plan Catalyst should produce — never a per-row
subquery:

- Q4  EXISTS        -> left-semi join with a non-equi residual
- Q13 LEFT JOIN+agg -> outer join preserved through two aggregations
- Q15 scalar MAX    -> one-row broadcast attach (no second scan: the max
                       re-derives from the grouped table)
- Q18 HAVING SUM    -> grouped semi-filter joined back to the facts
- Q21 EXISTS/NOT EXISTS self-joins -> two grouped passes over lineitem,
                       no correlated re-scan
- Q22 scalar AVG + NOT EXISTS -> broadcast threshold + anti join

The driver tables have no partsupp / l_commitdate / c_phone, so where the
canonical query needs one, the nearest driver-schema predicate stands in
(noted per query); the *plan shape* — which is what these test — is
unchanged.

Scale notes: every decorrelation here turns a correlated probe into a
keyed shuffle (semi/anti/grouped join) that partitions on the same key as
the main fact table, so each query is one-to-two shuffles total and every
scalar subquery is a one-row broadcast. Money sums use scaled-integer
stable aggregation (queries/_stable.py) so 32-way partials match the
single-threaded oracle bitwise.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries._stable import (
    sql_stable_avg,
    sql_stable_sum,
    stable_avg,
    stable_sum,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_REVENUE = "l_extendedprice * (1 - l_discount)"


def _revenue():
    return F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))


@query(
    "order_priority_exists",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 90 DAY
          )
    GROUP BY o_orderpriority
    """,
    tags=("tpch-q4", "semi-join", "subquery"),
)
def order_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape: priority counts of orders with a late shipment.

    The canonical EXISTS(l_commitdate < l_receiptdate) becomes
    EXISTS(l_shipdate > o_orderdate + 90 days) on the driver schema — the
    plan-shape point is identical: a correlated EXISTS whose residual
    predicate references the outer row, decorrelated to a LEFT SEMI join
    on l_orderkey with the non-equi part left as the join residual. The
    date filter on orders is pushed to the parquet scan before the join,
    and the semi join shuffles both sides on orderkey once.
    """
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "cust_order_distribution",
    sql="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    tags=("tpch-q13", "outer-join", "agg"),
)
def cust_order_distribution(spark, sf_dir):
    """TPC-H Q13: the order-count *distribution* over customers.

    A left outer join (the canonical o_comment NOT LIKE filter becomes an
    o_orderpriority filter on the driver schema — both are join-side
    residuals, which is the point: the filter must ride the join, not
    drop customers) followed by two aggregations: count per customer
    (preserving zero-order customers from the outer join), then the
    histogram of those counts. First agg shuffles on custkey — the same
    key as the join, so AQE can reuse the exchange; second agg's input is
    one row per customer and its key space is tiny (order counts), so the
    final shuffle is negligible at any SF.
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "top_supplier_revenue",
    sql=f"""
    WITH revenue0 AS (
        SELECT l_suppkey, {sql_stable_sum(_REVENUE, 4)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    """,
    tags=("tpch-q15", "scalar-subquery", "agg"),
)
def top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15: the supplier(s) with the maximum quarterly revenue.

    The scalar subquery MAX(total_revenue) is decorrelated as a one-row
    aggregate over the *already grouped* revenue table — not a second
    scan of lineitem — attached via crossJoin(broadcast(one_row)), the
    same broadcast-NLJ shape tfidf_top_terms uses. Equality on the
    stable-summed double is safe across engines because both sides
    derive it from the same exact scaled-integer sum. The winners set
    (ties included) is bounded, so it broadcasts into the supplier join.
    """
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        stable_sum(_revenue(), 4).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    winners = rev.crossJoin(F.broadcast(mx)).where(
        F.col("total_revenue") == F.col("_mx")
    )
    s = read_table(spark, sf_dir, "supplier")
    return s.join(
        F.broadcast(winners), F.col("s_suppkey") == F.col("l_suppkey")
    ).select("s_suppkey", "s_name", "total_revenue")


@query(
    "large_volume_orders",
    sql="""
    WITH big AS (
        SELECT l_orderkey,
               SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sum_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 300
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("tpch-q18", "having", "agg-join"),
)
def large_volume_orders(spark, sf_dir):
    """TPC-H Q18: customers behind the largest-volume orders.

    The canonical IN (SELECT l_orderkey ... HAVING SUM(qty) > t) is
    decorrelated by aggregating lineitem once and joining the surviving
    keys back — the grouped table IS the semi-filter, no second lineitem
    scan. Quantities are integral-valued doubles, summed as BIGINT so
    the HAVING threshold is an exact integer comparison in both engines.
    The big-orders set is a tiny fraction of orders (>300 units is the
    p99.9 tail) and AQE broadcasts it at bench scale — but it GROWS
    with SF (0.1% of orders is still millions of rows at 100 TB), so
    the hint is deliberately not pinned and the join falls back to a
    keyed shuffle when the runtime size says so. The customer join
    shuffles on custkey. Total order + key tiebreak before LIMIT.
    """
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "waiting_supplier_counts",
    sql="""
    WITH order_stats AS (
        SELECT l_orderkey,
               MAX(l_shipdate) AS max_ship,
               COUNT(DISTINCT l_suppkey) AS nsupp
        FROM lineitem
        GROUP BY l_orderkey
    ),
    at_max AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l
        JOIN order_stats os
          ON l.l_orderkey = os.l_orderkey AND l.l_shipdate = os.max_ship
        WHERE os.nsupp > 1
        GROUP BY l.l_orderkey, l.l_suppkey
    ),
    sole AS (
        SELECT l_orderkey, MIN(l_suppkey) AS l_suppkey
        FROM at_max
        GROUP BY l_orderkey
        HAVING COUNT(*) = 1
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM sole JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("tpch-q21", "exists", "not-exists", "self-join"),
)
def waiting_supplier_counts(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who alone held up multi-supplier orders.

    Canonical Q21 is EXISTS(another supplier in the order) AND NOT
    EXISTS(another supplier also late); with no l_receiptdate, "late" is
    "shipped last" (l_shipdate = per-order max). Both correlated
    subqueries decorrelate into grouped passes over lineitem keyed by
    orderkey — the EXISTS becomes nsupp > 1, the NOT EXISTS becomes
    "exactly one distinct supplier at the max ship date" — so the whole
    query is three hash aggregations and one join, all partitioned on
    l_orderkey (one shuffle key reused), instead of two correlated
    re-scans per outer row. MIN(l_suppkey) on the sole-survivor group is
    degenerate (the group has one row) but keeps both engines' plans
    agg-shaped.
    """
    li = read_table(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_suppkey").alias("nsupp"),
    )
    at_max = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            stats.where(F.col("nsupp") > 1),
            ["l_orderkey"],
        )
        .where(F.col("l_shipdate") == F.col("max_ship"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sole = (
        at_max.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("l_suppkey"),
            F.count(F.lit(1)).alias("_n"),
        )
        .where(F.col("_n") == 1)
    )
    s = read_table(spark, sf_dir, "supplier")
    return (
        sole.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "idle_customer_balance",
    sql=f"""
    SELECT c_mktsegment,
           COUNT(*) AS numcust,
           {sql_stable_sum('c_acctbal')} AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT {sql_stable_avg('c_acctbal')}
            FROM customer WHERE c_acctbal > 0.0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1999-01-01'
          )
    GROUP BY c_mktsegment
    """,
    tags=("tpch-q22", "anti-join", "scalar-subquery"),
)
def idle_customer_balance(spark, sf_dir):
    """TPC-H Q22 shape: well-funded customers gone quiet, by segment.

    Two decorrelations in one query: the scalar AVG subquery becomes a
    one-row broadcast threshold (stable_avg on both sides — the exact
    scaled-integer sum divided by the count — so the > comparison sees
    bitwise-identical doubles in both engines), and the NOT EXISTS
    becomes a LEFT ANTI join against recent orders (the driver schema
    has no c_phone, so "no order since 1999" stands in for "never
    ordered" — it keeps the anti side selective instead of empty). The
    anti join's right side is pre-filtered and projected to one column
    before the shuffle.
    """
    c = read_table(spark, sf_dir, "customer")
    thresh = c.where(F.col("c_acctbal") > 0.0).agg(
        stable_avg(F.col("c_acctbal")).alias("_avg")
    )
    recent = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            stable_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )
