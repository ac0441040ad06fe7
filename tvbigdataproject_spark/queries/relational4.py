"""Deeper TPC-H-shaped relational coverage: Q7 (nation-pair trade
volume), Q8 (market share), Q14 (promo revenue share), Q19 (disjunctive
predicate join).

These four exercise plan shapes the existing suite doesn't: a
cross-oriented two-nation join (Q7's cust-nation × supp-nation pairing),
a share-of-aggregate computed inside one grouped pass (Q8/Q14 — ratio of
conditional sum to total sum, no second scan and no scalar-subquery
join), and a join whose residual predicate is a multi-arm disjunction
over both sides' columns (Q19 — the shape that nudges naive planners
into nested loops; here the equi-key carries the join, the disjunction
stays a filter).

All money sums use the scaled-integer stable form (queries/_stable.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries._stable import sql_stable_sum, stable_sum
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_REVENUE = "l_extendedprice * (1 - l_discount)"


def _revenue():
    return F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))


@query(
    "nation_trade_volume",
    sql=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           COUNT(*) AS n_items,
           {sql_stable_sum(_REVENUE)} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_nationkey <> sn.n_nationkey
    GROUP BY 1, 2, 3
    """,
    tags=("join", "tpch-q7"),
)
def nation_trade_volume(spark, sf_dir):
    """TPC-H Q7 shape: cross-border trade volume by (customer nation,
    supplier nation, ship year). The two nation attaches are hinted
    broadcasts (25 rows, bounded at any SF); customer and supplier
    attaches are left to AQE — they scale with the data (VERDICT r2
    item 2 discipline). One shuffle agg on the 3-part key.
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    cn = F.broadcast(nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")))
    sn = F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(cn, customer.c_nationkey == F.col("cn_key"))
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(sn, supplier.s_nationkey == F.col("sn_key"))
        .where(F.col("cn_key") != F.col("sn_key"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            stable_sum(_revenue()).alias("revenue"),
        )
    )


@query(
    "nation_market_share",
    sql=f"""
    WITH sales AS (
        SELECT sn.n_name AS supp_nation,
               CAST(year(o_orderdate) AS BIGINT) AS order_year,
               {sql_stable_sum(_REVENUE)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        GROUP BY 1, 2
    )
    SELECT supp_nation, order_year, revenue,
           revenue / (SUM(CAST(ROUND(revenue * 100) AS BIGINT))
                          OVER (PARTITION BY order_year) / 100.0)
               AS market_share
    FROM sales
    """,
    tags=("join", "window", "tpch-q8"),
)
def nation_market_share(spark, sf_dir):
    """TPC-H Q8 shape: each supplier nation's share of global revenue
    per order year. The share divides by a window total over the
    aggregated (nation × year) table — dozens of rows, so the
    partition-by-year window is deliberately tiny (same reasoning as
    domain_mixture_weights), never a second pass over lineitem. The
    stable sum makes the numerator/denominator bit-identical across
    engines, so the double division is too.
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    from pyspark.sql import Window

    sales = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(
            F.broadcast(nation),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(stable_sum(_revenue()).alias("revenue"))
    )
    # the window denominator re-sums the per-nation revenues — a plain
    # double sum there is order-dependent across engines even though
    # each input is bit-identical, so the scaled-integer form applies to
    # the window aggregate too (each revenue is exactly S/100.0, so
    # round(revenue*100) recovers the scaled long losslessly)
    w = Window.partitionBy("order_year")
    denom = (
        F.sum(F.round(F.col("revenue") * 100).cast("long")).over(w) / 100.0
    )
    return sales.select(
        "supp_nation",
        "order_year",
        "revenue",
        (F.col("revenue") / denom).alias("market_share"),
    )


@query(
    "promo_revenue_share",
    sql=f"""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           {sql_stable_sum(f"CASE WHEN p_type = 'PROMO' THEN {_REVENUE} ELSE 0 END")}
               AS promo_revenue,
           {sql_stable_sum(_REVENUE)} AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
    tags=("join", "agg", "tpch-q14"),
)
def promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: promo-part revenue vs total per ship year —
    the conditional and unconditional sums ride ONE aggregate pass (a
    CASE inside the sum), not two scans or a self-join. The ratio is
    left to the reader/consumer to keep both components exact; dividing
    two stable sums would also be bitwise-safe (see
    nation_market_share).
    """
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    promo_rev = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(F.lit(0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            stable_sum(promo_rev).alias("promo_revenue"),
            stable_sum(_revenue()).alias("total_revenue"),
        )
    )


@query(
    "disjunctive_brand_revenue",
    sql=f"""
    SELECT COUNT(*) AS n_items, {sql_stable_sum(_REVENUE)} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#9'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
       OR (p_brand = 'Brand#2'  AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
    tags=("join", "predicate", "tpch-q19"),
)
def disjunctive_brand_revenue(spark, sf_dir):
    """TPC-H Q19 shape: a three-arm disjunction mixing columns from both
    join sides. The join key (l_partkey = p_partkey) stays a clean
    equi-join — the disjunction is a post-join residual filter, so the
    plan is a hash join + filter, never a nested loop (the reference's
    own disjunctive report join fell into exactly that trap — SURVEY.md
    J5). Single-side conjuncts (each arm's p_size/p_brand bounds) are
    pushed below the join by Catalyst as an OR-union filter on part.
    """
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    arm = lambda brand, slo, shi, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(slo, shi)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(
            arm("Brand#9", 1, 15, 1, 20)
            | arm("Brand#19", 10, 30, 10, 40)
            | arm("Brand#2", 20, 50, 20, 50)
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            stable_sum(_revenue()).alias("revenue"),
        )
    )


@query(
    "variant_props_stats",
    sql="""
    WITH x AS (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           COUNT(CASE WHEN k % 2 = 0 THEN 1 END) AS n_even_k,
           COUNT(CASE WHEN k % 2 = 1 THEN 1 END) AS n_odd_k,
           SUM(k) AS sum_k
    FROM x GROUP BY event_type
    """,
    tags=("scalar", "json", "variant"),
)
def variant_props_stats(spark, sf_dir):
    """Semi-structured access via Spark 4's VariantType: parse_json once
    into a variant column, then typed variant_get extraction — the
    modern path beside json_props' from_json-with-schema (variant keeps
    the full document queryable without pre-declaring a schema, at a
    binary encoding that extracts fields without re-parsing text, which
    is what makes it viable over petabyte JSON lakes). Exact integer
    aggregates, so the oracle (plain JSON extraction — DuckDB has no
    variant, the VALUES must agree regardless of encoding) matches
    bitwise.
    """
    ev = read_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    x = ev.select("event_type", k.alias("k"))
    return x.groupBy("event_type").agg(
        F.count(F.when(F.col("k") % 2 == 0, F.lit(1))).alias("n_even_k"),
        F.count(F.when(F.col("k") % 2 == 1, F.lit(1))).alias("n_odd_k"),
        F.sum("k").alias("sum_k"),
    )
