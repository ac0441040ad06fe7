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
