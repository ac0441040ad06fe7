"""Deeper analytic queries — multi-way join chains, scalar-subquery
shapes, and skew-resilient aggregation. These exercise Catalyst's join
reordering / subquery decorrelation and document the engine's skew
playbook (salting) with an oracle proving it changes nothing but the
physical shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.queries._stable import sql_stable_sum, stable_sum
from tvbigdataproject_spark.sources import read_table


@query(
    "regional_revenue",
    sql=f"""
    SELECT r_name, n_name,
           COUNT(*) AS n_lineitems,
           {sql_stable_sum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    tags=("join", "agg", "tpch-q5"),
)
def regional_revenue(spark, sf_dir):
    """TPC-H Q5-style 5-way join chain: fact → fact → three dims.

    The physical shape that survives 100 TB: lineitem⋈orders shuffles on
    the order key (both fact-sized); customer is linear in SF too, so it
    gets no hard hint — AQE broadcasts it when it measures small and
    shuffles it when it doesn't. Only nation (25 rows) and region
    (5 rows) are hint-broadcast: genuinely bounded at any scale.
    """
    li, orders, customer, nation, region = (
        read_table(spark, sf_dir, t)
        for t in ("lineitem", "orders", "customer", "nation", "region")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        stable_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
    )


@query(
    "small_quantity_parts",
    sql="""
    WITH part_avg AS (
        SELECT l_partkey, AVG(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l.l_partkey, COUNT(*) AS n_small
    FROM lineitem l JOIN part_avg p ON l.l_partkey = p.l_partkey
    WHERE l.l_quantity < 0.5 * p.avg_qty
    GROUP BY l.l_partkey
    """,
    tags=("join", "subquery", "tpch-q17"),
)
def small_quantity_parts(spark, sf_dir):
    """TPC-H Q17-style correlated scalar subquery, decorrelated by hand
    into aggregate-then-self-join — the plan Catalyst's decorrelation
    produces anyway, written explicitly so the shape is visible: one
    groupBy over the fact, then a join back. part_avg has one row per
    partkey (per-entity aggregate, linear in SF) so it carries no
    broadcast hint — the join back is a co-partitioned shuffle join on
    l_partkey (both sides already hash on it from the groupBy), or an
    AQE runtime broadcast when the aggregate is actually small.

    avg_qty compares, never projects — l_quantity values are exact
    integers-in-doubles so the AVG is order-free (exact sum / count) and
    the predicate is engine-stable.
    """
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    part_avg = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(part_avg, "l_partkey")
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_small"))
    )


@query(
    "priority_order_counts",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity > 45
    )
    GROUP BY o_orderpriority
    """,
    tags=("join", "subquery", "tpch-q4"),
)
def priority_order_counts(spark, sf_dir):
    """TPC-H Q4-style EXISTS: semi-join then aggregate. The semi-join
    short-circuits per key (no fan-out however many lineitems match) —
    the property that keeps this linear when the inner side is huge."""
    orders = read_table(spark, sf_dir, "orders")
    big_items = read_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        orders.join(big_items, orders.o_orderkey == big_items.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "salted_type_counts",
    sql="""
    SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    tags=("agg", "skew"),
)
def salted_type_counts(spark, sf_dir):
    """Two-phase salted aggregation over a 5-value grouping key.

    event_type has 5 distinct values — grouped directly, at most 5 tasks
    do all the final-aggregation work no matter the cluster size (and one
    hot key serializes its entire partition through one task). Salting
    splits each key 16 ways for the wide phase, then reduces the 80
    partials. Results are identical to the plain groupBy — the oracle is
    the plain SQL — only the physical distribution changes. This is the
    engine's standard recipe for skewed/low-cardinality keys where AQE's
    skew-join splitting doesn't apply (it only handles joins).

    count-distinct composes through salting by salting WITH the distinct
    column in phase one (user_id counted exactly once per (type, salt)
    since the salt is derived from user_id, never randomly).
    """
    ev = read_table(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.hash("user_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("n_part"),
        F.countDistinct("user_id").alias("u_part"),
    )
    # a given user_id lands in exactly one salt bucket per type, so the
    # distinct partials add without overlap
    return partial.groupBy("event_type").agg(
        F.sum("n_part").alias("n"),
        F.sum("u_part").cast("long").alias("n_users"),
    )


@query(
    "salted_join_revenue",
    sql=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           {sql_stable_sum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("join", "skew"),
)
def salted_join_revenue(spark, sf_dir):
    """The manual salted-join recipe (operators/skew.py) on the
    lineitem⋈orders fact join: each probe key is scattered over 16
    salted partitions, the build side is replicated 16 ways, and the
    oracle is the PLAIN join SQL — proving salting changes only the
    physical distribution, never the result. Companion to
    salted_type_counts (which salts aggregation; this salts the join
    itself, for hot keys AQE's sort-merge-only skew splitting can't
    reach)."""
    from tvbigdataproject_spark.operators.skew import salted_join

    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    # salt on the natural key so the scan stays pruned to the columns
    # the query actually needs (l_linenumber varies within an orderkey,
    # which is what spreads a hot order across salts)
    joined = salted_join(
        li,
        orders,
        "l_orderkey",
        "o_orderkey",
        n_salt=16,
        salt_cols=["l_orderkey", "l_linenumber"],
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        stable_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "revenue"
        ),
    )
