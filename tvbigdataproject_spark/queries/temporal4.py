"""Temporal batch 4: interval coalescing.

sessionize_events groups by inactivity GAPS; interval coalescing is the
other canonical temporal reduction — events carry explicit durations,
and overlapping/touching intervals per user merge into maximal covered
spans (the SQL-standard "packing intervals" problem: machine uptime,
ad exposure, on-call coverage). The merge is the classic running-max
sweep: an interval starts a new span iff its start exceeds the maximum
end seen so far in its partition.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "interval_coalesce_user",
    sql="""
    WITH iv AS (
        SELECT user_id, event_id,
               epoch_us(ts) AS s_us,
               epoch_us(ts)
                   + ((ABS(CAST(ROUND(value * 10) AS BIGINT)) % 600) + 60)
                     * 1000000 AS e_us
        FROM events
    ),
    m AS (
        SELECT user_id, event_id, s_us, e_us,
               MAX(e_us) OVER (
                   PARTITION BY user_id ORDER BY s_us, e_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_max
        FROM iv
    ),
    g AS (
        SELECT user_id, s_us, e_us,
               CAST(SUM(CASE WHEN prev_max IS NULL OR s_us > prev_max
                             THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY s_us, e_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS grp
        FROM m
    )
    SELECT user_id, grp,
           MIN(s_us) AS span_start_us,
           MAX(e_us) AS span_end_us,
           COUNT(*) AS n_intervals,
           (MAX(e_us) - MIN(s_us)) // 1000000 AS span_seconds
    FROM g GROUP BY user_id, grp
    """,
    tags=("temporal", "intervals", "window"),
)
def interval_coalesce_user(spark, sf_dir):
    """Coalesce each user's event intervals (start = ts, duration 60 to
    659 seconds derived deterministically from the event value) into
    maximal overlapping-or-touching spans: the "packing intervals"
    operator (exposure windows, uptime stitching) that sessionization's
    gap rule cannot express because here overlap comes from explicit
    durations, not inter-event gaps.

    The sweep is one running-max window per user: an interval opens a
    new span iff its start strictly exceeds every earlier interval's
    end (touching spans merge); the span id is the running count of
    openers. Exactness: all in integer microseconds (epoch_us /
    unix_micros), the duration is |round(value*10)| so negative values
    floor identically in both engines, and the window order is fully
    tied down (start, end, event_id).

    Scale shape: two windows and one aggregate, all partitioned BY
    USER — no global window, no join; skewed users bound the partition
    like any sessionizer.
    """
    ev = read_table(spark, sf_dir, "events")
    dur_us = (
        (F.abs(F.round(F.col("value") * 10).cast("long")) % 600 + 60)
        * 1_000_000
    )
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s_us"),
        (F.unix_micros(F.col("ts").cast("timestamp")) + dur_us).alias(
            "e_us"
        ),
    )
    order = [F.col("s_us"), F.col("e_us"), F.col("event_id")]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    opener = F.when(
        F.col("prev_max").isNull() | (F.col("s_us") > F.col("prev_max")), 1
    ).otherwise(0)
    g = iv.withColumn("prev_max", F.max("e_us").over(w_prev)).select(
        "user_id",
        "s_us",
        "e_us",
        F.sum(opener).over(w_run).cast("long").alias("grp"),
    )
    return g.groupBy("user_id", "grp").agg(
        F.min("s_us").alias("span_start_us"),
        F.max("e_us").alias("span_end_us"),
        F.count(F.lit(1)).alias("n_intervals"),
        F.expr("(max(e_us) - min(s_us)) div 1000000").alias("span_seconds"),
    )


@query(
    "attribution_u_shaped",
    sql="""
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
        FROM events WHERE event_type = 'click'
    ),
    j AS (
        SELECT p.purchase_id, c.click_id, c.c_us,
               ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                  ORDER BY c.c_us, c.click_id) AS pos,
               COUNT(*) OVER (PARTITION BY p.purchase_id) AS n_clicks
        FROM p JOIN c ON p.user_id = c.user_id
        WHERE p.p_us - c.c_us BETWEEN 0 AND 3600000000
    )
    SELECT purchase_id, click_id, CAST(pos AS BIGINT) AS pos,
           CAST(n_clicks AS BIGINT) AS n_clicks,
           CAST(CASE
               WHEN n_clicks = 1 THEN 1000
               WHEN n_clicks = 2 THEN 500
               WHEN pos = 1 OR pos = n_clicks THEN 400
               ELSE 200 // (n_clicks - 2)
                    + CASE WHEN pos - 1 <= 200 % (n_clicks - 2)
                           THEN 1 ELSE 0 END
           END AS BIGINT) AS weight_permille
    FROM j
    """,
    tags=("temporal", "attribution", "window"),
)
def attribution_u_shaped(spark, sf_dir):
    """U-shaped (position-based) multi-touch attribution: each purchase
    credits its same-user clicks of the preceding hour 40% to the
    first touch, 40% to the last, and 20% split across the middles —
    in exact integer permille, with the indivisible remainder of
    200/(n-2) assigned one point each to the EARLIEST middles, so
    credits always sum to exactly 1000 and both engines agree
    bit-for-bit (attribution_last_touch is the 100%-last special case;
    the U-shape is what growth teams actually report).

    Scale shape: one user-keyed equi join with the 1-hour band as a
    post-filter (the nearest_click_join contract), then two windows
    sharing the per-purchase partitioning — no global sort, no second
    shuffle.
    """
    ev = read_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("p_us"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("c_us"),
    )
    gap = F.col("p_us") - F.col("c_us")
    w = Window.partitionBy("purchase_id")
    j = (
        p.join(c, p.user_id == c.c_user)
        .where((gap >= 0) & (gap <= 3_600_000_000))
        .select(
            "purchase_id",
            "click_id",
            F.row_number()
            .over(w.orderBy("c_us", "click_id"))
            .cast("long")
            .alias("pos"),
            F.count(F.lit(1)).over(w).cast("long").alias("n_clicks"),
        )
    )
    mid_q = F.expr("200 div (n_clicks - 2)")
    mid_r = F.expr("200 % (n_clicks - 2)")
    weight = (
        F.when(F.col("n_clicks") == 1, 1000)
        .when(F.col("n_clicks") == 2, 500)
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("n_clicks")), 400
        )
        .otherwise(
            mid_q
            + F.when(F.col("pos") - 1 <= mid_r, 1).otherwise(0)
        )
    )
    return j.select(
        "purchase_id",
        "click_id",
        "pos",
        "n_clicks",
        weight.cast("long").alias("weight_permille"),
    )
