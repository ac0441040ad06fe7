"""TPC-H join/aggregate shapes: Q6, Q10, Q12, and the partsupp family
(Q2, Q9, Q11, Q16, Q20) adapted to the driver schema.

The driver testdata has no partsupp table, so the five queries that
join through it use **lineitem as the part-supplier link** — the
grouped (l_partkey, l_suppkey) table plays partsupp's role. That keeps
every canonical plan shape intact:

- Q2  correlated MIN per part      -> grouped min + equality join back
- Q6  pure scan-side filter + agg  -> zero-shuffle (one-row result)
- Q9  4-way profit join            -> star join, bounded dims broadcast
- Q10 returned-item top-k          -> 3 facts + dim, total-order LIMIT
- Q11 HAVING > fraction-of-total   -> re-aggregated scalar from the
                                      grouped table (single fact scan)
- Q12 conditional counts per group -> one-pass CASE sums
- Q16 NOT IN + COUNT(DISTINCT)     -> anti join + distinct agg
- Q20 nested agg share predicate   -> two grouped passes, exact-integer
                                      2*qty > total comparison

Scale notes: nation/region broadcasts are bounded at any SF; the
grouped (part, supplier) tables are |part|x|avg suppliers per part| —
orders of magnitude below lineitem — and re-aggregating their exact
scaled-integer sums gives every scalar "total" without a second fact
scan. Money sums use queries/_stable.py so 32-way partials match the
oracle bitwise; share predicates are written in integer space
(2*qty > total) so the comparison is exact in both engines.
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
    "forecast_revenue_change",
    sql=f"""
    SELECT {sql_stable_sum('l_extendedprice * l_discount', 4)} AS revenue_delta,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    tags=("tpch-q6", "filter", "pushdown"),
)
def forecast_revenue_change(spark, sf_dir):
    """TPC-H Q6: revenue impact of dropping a discount band.

    The whole query is scan-side: three range predicates (all pushed to
    the parquet reader) and a single global aggregate — no join, no
    groupBy shuffle, one partial-agg row per input split. The point at
    100 TB is that the plan stays a one-stage scan; discount doubles
    compare against the same literals in both engines so membership is
    identical, and the 4-decimal product rounds exactly (2-dec price x
    2-dec discount).
    """
    li = read_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        stable_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias(
            "revenue_delta"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "returned_item_losses",
    sql=f"""
    SELECT c_custkey, c_name, n_name,
           {sql_stable_sum(_REVENUE, 4)} AS revenue,
           {sql_stable_sum('c_acctbal')} / COUNT(*) AS c_acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch-q10", "join", "topk"),
)
def returned_item_losses(spark, sf_dir):
    """TPC-H Q10: customers who returned the most revenue, half-year window.

    Star shape: two fact joins (customer-orders on custkey, orders-
    lineitem on orderkey) with the date filter pushed into the orders
    scan and the returnflag filter into the lineitem scan BEFORE either
    shuffle; nation is a bounded dim, broadcast. The per-customer
    grouped result carries c_acctbal through the aggregate as
    sum/count (constant within the group, so the division reproduces
    the original value exactly from integer-stable parts — both engines
    do the same arithmetic). Total order + custkey tiebreak before the
    LIMIT makes the top-20 deterministic at any parallelism; Spark
    plans it as TakeOrdered, never a global sort.
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            stable_sum(_revenue(), 4).alias("revenue"),
            (stable_sum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "priority_counts_by_flag",
    sql="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
    tags=("tpch-q12", "conditional-agg", "join"),
)
def priority_counts_by_flag(spark, sf_dir):
    """TPC-H Q12: high/low-priority line counts per group, one pass.

    The canonical shipmode dimension becomes l_returnflag on the driver
    schema; the shape is the interesting part — two complementary
    conditional counts computed in a single grouped pass over the join
    (CASE sums, no second scan, no pivot), with the date filter pushed
    to the lineitem scan. Map-side partial aggregation shrinks the
    shuffle to |groups| rows per task.
    """
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "min_cost_supplier_per_part",
    sql="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ),
    best AS (
        SELECT l_partkey, MIN(unit_cost) AS best_cost
        FROM cost
        GROUP BY l_partkey
    )
    SELECT p_partkey, p_brand, s_name, unit_cost
    FROM part
    JOIN cost ON cost.l_partkey = p_partkey
    JOIN best ON best.l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_type = 'STANDARD' AND p_size <= 15
      AND unit_cost = best_cost
    ORDER BY unit_cost, p_partkey, s_name
    LIMIT 100
    """,
    tags=("tpch-q2", "correlated-min", "join"),
)
def min_cost_supplier_per_part(spark, sf_dir):
    """TPC-H Q2 shape: the cheapest supplier for each qualifying part.

    The canonical correlated subquery (ps_supplycost = MIN over partsupp
    for that part) is decorrelated the classic way: aggregate once per
    (part, supplier) — lineitem's observed unit price standing in for
    ps_supplycost — take the per-part MIN, and join the min back on
    equality. MIN is a selection (not an accumulation), so the double
    compares bitwise-identically in both engines. The part filter is
    applied before the joins (pushed to the part scan); both grouped
    tables shuffle on l_partkey, so the three-way join reuses one
    partitioning. Ties on best cost keep all suppliers, making the
    result order-insensitive; total order + two tiebreaks before LIMIT.
    """
    li = read_table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = (
        cost.groupBy("l_partkey")
        .agg(F.min("unit_cost").alias("best_cost"))
        .withColumnRenamed("l_partkey", "_best_partkey")
    )
    p = read_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    )
    s = read_table(spark, sf_dir, "supplier")
    return (
        p.join(cost, cost["l_partkey"] == F.col("p_partkey"))
        .join(best, F.col("_best_partkey") == F.col("p_partkey"))
        .where(F.col("unit_cost") == F.col("best_cost"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("p_partkey", "p_brand", "s_name", "unit_cost")
        .orderBy("unit_cost", "p_partkey", "s_name")
        .limit(100)
    )


@query(
    "profit_by_nation_year",
    sql=f"""
    SELECT n_name AS nation,
           CAST(year(l_shipdate) AS BIGINT) AS o_year,
           {sql_stable_sum(
               'l_extendedprice * (1 - l_discount)'
               ' - 0.6 * p_retailprice * l_quantity', 4)} AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, CAST(year(l_shipdate) AS BIGINT)
    """,
    tags=("tpch-q9", "star-join", "agg"),
)
def profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9: product-line profit by supplier nation and year.

    Four-way star join around lineitem; ps_supplycost becomes a
    0.6 x p_retailprice standard-cost proxy (same operand order in both
    engines so the double expression is bitwise-identical before the
    stable rounding). The p_name LIKE filter prunes part BEFORE its
    join — at TPC-H ratios the filtered part table and supplier are
    both orders of magnitude under lineitem; part joins by shuffle on
    partkey (it scales with SF), supplier and nation broadcast
    (supplier here is the 100-row driver table; at a true 100 TB run
    supplier would shuffle too — the hint is deliberately NOT pinned).
    One grouped pass with map-side partials finishes it.
    """
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(stable_sum(profit, 4).alias("sum_profit"))
    )


@query(
    "important_part_value",
    sql="""
    WITH val0 AS (
        SELECT l_partkey,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sv
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE n_name IN ('NATION_3', 'NATION_7')
        GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, sv / 100.0 AS part_value
    FROM val0
    WHERE sv / 100.0 > (SELECT SUM(sv) FROM val0) / 100.0 * 0.002
    ORDER BY part_value DESC, p_partkey
    LIMIT 200
    """,
    tags=("tpch-q11", "scalar-subquery", "having"),
)
def important_part_value(spark, sf_dir):
    """TPC-H Q11: parts holding an outsized share of tracked value.

    The canonical fraction-of-total HAVING. The scalar total is NOT a
    second scan: the per-part scaled-integer sums re-aggregate exactly
    (integer addition is associative), so the grand total derives from
    the grouped table itself — one fact scan, then a one-row broadcast
    attach and a filter. Both engines compute the threshold as
    (exact integer sum) / 100.0 * 0.002 in the same operand order, so
    the > comparison sees identical doubles. Nation filter prunes the
    supplier side before the lineitem join.
    """
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    val0 = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sv")
        )
    )
    total = val0.agg(F.sum("sv").alias("_tot"))
    return (
        val0.crossJoin(F.broadcast(total))
        .where(F.col("sv") / 100.0 > F.col("_tot") / 100.0 * 0.002)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("sv") / 100.0).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
        .limit(200)
    )


@query(
    "supplier_count_by_part_attr",
    sql="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
          )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 100
    """,
    tags=("tpch-q16", "anti-join", "count-distinct"),
)
def supplier_count_by_part_attr(spark, sf_dir):
    """TPC-H Q16: how many suppliers can serve each part segment.

    The NOT IN subquery (canonically suppliers with complaints; here
    negative balance) becomes a LEFT ANTI join — safe because s_suppkey
    is non-nullable, which is exactly the condition that lets a planner
    avoid NOT IN's null-semantics nested loop. Part filters prune
    before the join; COUNT(DISTINCT) runs as Spark's two-phase
    distinct-expand aggregate, partitioned by the group keys. The anti
    side is projected to its single key column before the join; it
    scales with the supplier table, so no broadcast is pinned — AQE
    picks broadcast at bench scale and falls back to a keyed shuffle
    when the runtime size warrants.
    """
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    bad = (
        read_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(100)
    )


@query(
    "dominant_supplier_parts",
    sql="""
    WITH pq AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
        SELECT l_partkey, SUM(qty) AS total_qty, COUNT(*) AS nsupp
        FROM pq
        GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name, COUNT(*) AS dominant_parts
    FROM pq
    JOIN tot USING (l_partkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE qty * nsupp > 2 * total_qty
    GROUP BY s_suppkey, s_name
    ORDER BY dominant_parts DESC, s_suppkey
    LIMIT 50
    """,
    tags=("tpch-q20", "nested-agg", "share-predicate"),
)
def dominant_supplier_parts(spark, sf_dir):
    """TPC-H Q20 shape: suppliers holding a majority share of a part.

    Canonical Q20 asks for suppliers whose availability exceeds half
    the demanded quantity — a nested aggregate compared against an
    outer aggregate. Without partsupp, the driver-schema version asks
    which suppliers shipped more than twice their fair share of a
    part's total units (qty > 2 * total/nsupp). Shape preserved
    exactly: aggregate (part, supplier), re-aggregate to per-part
    totals (exact integer re-sum of the grouped sums — no second
    lineitem scan), join back on partkey (one reused shuffle key), and
    filter on the share. The predicate is cross-multiplied to
    qty * nsupp > 2 * total in INTEGER space, so there is no float
    division to disagree about, and it stays selective-but-nonempty at
    every SF (a fixed absolute share like >50% empties out as per-part
    supplier counts grow with scale). Per-supplier counts close it out.
    """
    li = read_table(spark, sf_dir, "lineitem")
    pq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty")
    )
    tot = pq.groupBy("l_partkey").agg(
        F.sum("qty").alias("total_qty"), F.count(F.lit(1)).alias("nsupp")
    )
    s = read_table(spark, sf_dir, "supplier")
    return (
        pq.join(tot, "l_partkey")
        .where(F.col("qty") * F.col("nsupp") > F.col("total_qty") * 2)
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("dominant_parts"))
        .orderBy(F.col("dominant_parts").desc(), "s_suppkey")
        .limit(50)
    )
