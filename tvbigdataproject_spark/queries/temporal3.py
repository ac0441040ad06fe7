"""Product-analytics temporal queries: conversion funnel and rolling
range-frame statistics.

The reference's domain is social-media engagement analytics; these are
the two event-stream questions such a pipeline asks next after windowed
counts (temporal.py): did users progress view→click→purchase, and what
does the trailing-24h signal look like at every event. Both
value-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "funnel_view_click_purchase",
    sql="""
    WITH steps AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events
        GROUP BY user_id
    )
    SELECT
        COUNT(*) AS n_users,
        COUNT(t_view) AS n_view,
        COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
        COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END)
            AS n_view_click_purchase
    FROM steps
    """,
    tags=("temporal", "funnel"),
)
def funnel_view_click_purchase(spark, sf_dir):
    """Strictly-ordered view→click→purchase conversion funnel: a user
    counts at each stage only if that event happened after their first
    event of the previous stage (first-touch semantics — MIN per stage,
    then order comparisons; NULL stage times drop out of the
    comparisons, which both engines treat identically).

    Scale shape: ONE hash aggregate keyed by user (conditional MINs ride
    the same pass — no per-stage join, no self-join chain, which is how
    funnel queries are usually written and why they fall over), then a
    global one-row rollup. User-key skew is irrelevant: the per-user
    state is three timestamps.
    """
    steps = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("t_purchase"),
        )
    )
    reached_2 = F.col("t_click") > F.col("t_view")
    reached_3 = reached_2 & (F.col("t_purchase") > F.col("t_click"))
    return steps.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count(F.when(reached_2, F.lit(1))).alias("n_view_click"),
        F.count(F.when(reached_3, F.lit(1))).alias("n_view_click_purchase"),
    )


@query(
    "rolling_24h_stats",
    sql="""
    SELECT event_id, event_type, ts,
           COUNT(*) OVER w AS n_24h,
           SUM(CAST(ROUND(value * 10000) AS BIGINT)) OVER w / 10000.0 AS sum_24h
    FROM events
    WINDOW w AS (
        PARTITION BY event_type ORDER BY ts
        RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW
    )
    """,
    tags=("temporal", "window", "rolling"),
)
def rolling_24h_stats(spark, sf_dir):
    """Trailing-24-hour event count and value sum per event_type at
    every event — the rolling feature every anomaly detector and
    rate-limit monitor computes. RANGE frame (time-based, not
    row-count-based), so sparse and dense hours get the same window
    semantics.

    Spark's range frame needs a numeric ordering column; ordering by
    unix_micros(ts) with a ±24h-in-micros bound is boundary-identical
    (inclusive, microsecond precision) to DuckDB's INTERVAL frame over
    the timestamp. The sum uses the scaled-integer stable form — a
    sliding-frame double sum is order-dependent in the last bits
    exactly like a grouped one. One shuffle, partitioned by event_type;
    at 100 TB the partition key widens (type × day) with per-chunk seed
    rows, same note as gap_fill_forward.
    """
    us_24h = 24 * 3600 * 1_000_000
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-us_24h, 0)
    )
    factor = 10**4
    return read_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_24h"),
        (
            F.sum(F.round(F.col("value") * factor).cast("long")).over(w)
            / float(factor)
        ).alias("sum_24h"),
    )


_SPINE_SQL_DUCK = """
    WITH RECURSIVE b AS (
        SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
        FROM events
    ),
    spine(day) AS (
        SELECT lo FROM b
        UNION ALL
        SELECT day + 1 FROM spine, b WHERE day < b.hi
    ),
    sparse AS (
        SELECT CAST(ts AS DATE) AS day,
               COUNT(*) AS n,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
        FROM events WHERE value > 480 GROUP BY CAST(ts AS DATE)
    )
    SELECT s.day,
           COALESCE(p.n, 0) AS n_high_value,
           COALESCE(p.cents, 0) AS cents
    FROM spine s LEFT JOIN sparse p ON s.day = p.day
"""


@query(
    "recursive_date_spine",
    sql=_SPINE_SQL_DUCK,
    tags=("temporal", "recursive-cte", "spine"),
)
def recursive_date_spine(spark, sf_dir):
    """Gap-free calendar spine via Spark 4's NATIVE recursive CTE
    (WITH RECURSIVE shipped in 4.0): generate every day between the
    global min and max event date by linear recursion, then zero-fill
    a sparse daily series (high-value events) against it — the
    canonical "report every day, including the empty ones" shape.
    gap_fill_forward solves the same problem with sequence(); this one
    exercises the engine's recursive-query surface itself, so the
    repo covers BOTH formulations a migrating user might bring.

    Engine notes: Spark's recursive CTEs accept UNION ALL bodies only
    (UNION-distinct recursion is rejected, which is why the iterative
    graph tier stays on the DataFrame loop operators — a dense-graph
    UNION ALL recursion enumerates walks, not nodes); a LINEAR
    recursion like this one grows one row per step, so the restriction
    costs nothing here. Spark spells the step DATE_ADD(day, 1) while
    DuckDB uses day + 1 — same arithmetic.

    Scale shape: the recursion materializes O(days) rows on a single
    node-side CTE — bounded by the calendar; the sparse side is one
    keyed agg; the join is spine x days, trivially broadcastable.
    """
    ev = read_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_spine_events")
    return spark.sql(
        """
        WITH RECURSIVE b AS (
            SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
            FROM _spine_events
        ),
        spine(day) AS (
            SELECT lo FROM b
            UNION ALL
            SELECT DATE_ADD(day, 1) FROM spine, b WHERE day < b.hi
        ),
        sparse AS (
            SELECT CAST(ts AS DATE) AS day,
                   COUNT(*) AS n,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
            FROM _spine_events WHERE value > 480 GROUP BY CAST(ts AS DATE)
        )
        SELECT s.day,
               COALESCE(p.n, 0) AS n_high_value,
               COALESCE(p.cents, 0) AS cents
        FROM spine s LEFT JOIN sparse p ON s.day = p.day
        """
    )
