"""Round-3 relational additions: full-outer join, the TPC-H Q3
shipping-priority shape (multi-join → agg → total-order top-k), a
fixed-width histogram, and the higher-order array-function surface
(transform / filter / exists / aggregate) that SURVEY §2.7's scalar rows
imply but no query exercised end-to-end.

All four are oracle-checked bitwise. The HOF lambdas stay unary on the
Spark side — arity dispatch would silently hand a second parameter the
element index (see functions/hashing.py NB).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries._stable import sql_stable_sum, stable_sum
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "join_full_outer",
    sql="""
    WITH clicks AS (
        SELECT user_id, COUNT(*) AS n_clicks
        FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    purchases AS (
        SELECT user_id, COUNT(*) AS n_purchases
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id, n_clicks, n_purchases
    FROM clicks c FULL OUTER JOIN purchases p ON c.user_id = p.user_id
    """,
    tags=("join",),
)
def join_full_outer(spark, sf_dir):
    """Full-outer equi-join (completes the J-row outer-join family next
    to left/semi/anti): per-user click counts against purchase counts,
    keeping users who only ever did one of the two. Null-producing on
    BOTH sides, which is what distinguishes it from J3/J4.

    Scale shape: both inputs are keyed aggregates of the same fact
    table, so the join is between two already-reduced sides sharing the
    shuffle key — AQE picks the strategy; no hints (either side can be
    large at 100 TB).
    """
    ev = read_table(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
        .alias("c")
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .alias("p")
    )
    return clicks.join(
        purchases, F.col("c.user_id") == F.col("p.user_id"), "full_outer"
    ).select(
        F.coalesce(F.col("c.user_id"), F.col("p.user_id")).alias("user_id"),
        "n_clicks",
        "n_purchases",
    )


@query(
    "shipping_priority",
    sql=f"""
    SELECT l_orderkey,
           {sql_stable_sum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "tpch-q3"),
)
def shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective filters on all three tables, a two-hop
    join chain, revenue aggregation per order, global top-k. The LIMIT
    is preceded by a total order (stable revenue + orderkey tiebreak) so
    both engines pick the same 10 rows.

    Scale shape: the date/segment predicates are native and reach the
    parquet scans (row-group skipping); customer is linear in SF so it
    carries no broadcast hint — AQE decides. The top-k itself is
    TakeOrderedAndProject: per-partition heaps of 10, never a global
    sort of the aggregate.
    """
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    customer = read_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "length_histogram",
    sql="""
    SELECT LEAST(CAST(n_chars // 500 AS BIGINT), 19) AS bucket,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY 1
    """,
    tags=("agg", "histogram"),
)
def length_histogram(spark, sf_dir):
    """Fixed-width histogram of document lengths (500-char buckets,
    clamped at bucket 19) — the corpus-profiling pass every data run
    starts with. One keyed aggregate over ≤20 keys; the floor-division
    bucket is exact integer math in both engines.
    """
    bucket = F.least(F.floor(F.col("n_chars") / 500), F.lit(19)).cast("long")
    return (
        read_table(spark, sf_dir, "documents")
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@query(
    "hof_token_funcs",
    sql="""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(t, x -> length(x) > 4)) AS BIGINT) AS n_long_tokens,
           CAST(COALESCE(list_aggregate(list_transform(t, x -> length(x)), 'sum'), 0)
                AS BIGINT) AS total_token_chars,
           len(list_filter(t, x -> length(x) > 9)) > 0 AS has_very_long
    FROM toks
    """,
    tags=("scalar", "hof"),
)
def hof_token_funcs(spark, sf_dir):
    """Higher-order array functions as first-class operators: filter
    (count of long tokens), transform+aggregate (total characters across
    tokens, folded JVM-side), exists (any token over 9 chars). These are
    the idiomatic replacement for per-row Python UDFs over array columns
    — whole-stage-codegen'd, zero Python round trips, scan-local at any
    scale.
    """
    t = F.split(F.lower(F.col("text")), " ")
    return read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(t, lambda x: F.length(x) > 4)).cast("long").alias(
            "n_long_tokens"
        ),
        F.aggregate(
            t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("total_token_chars"),
        F.exists(t, lambda x: F.length(x) > 9).alias("has_very_long"),
    )
