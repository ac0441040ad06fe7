"""Time-series reshaping over the events table: gap-filled hourly
resampling with forward fill, and OHLC bar aggregation.

North-star temporal surface beyond the window/session aggregations in
temporal.py — the two shapes every metrics/feature pipeline needs when
turning an irregular event stream into a regular time series. Both are
value-checked against DuckDB; picking values (open/close/last) is exact
in doubles, so no stable-sum scaffolding is needed (contrast
temporal.py's summed aggregates).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "gap_fill_forward",
    sql="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, value,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ),
    last_vals AS (
        SELECT event_type, hour, value FROM hourly WHERE rn = 1
    ),
    bounds AS (
        SELECT event_type, MIN(hour) AS mn, MAX(hour) AS mx
        FROM last_vals GROUP BY event_type
    ),
    grid AS (
        SELECT event_type, UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
        FROM bounds
    )
    SELECT g.event_type, g.hour,
           LAST_VALUE(v.value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value,
           (v.value IS NULL) AS filled
    FROM grid g
    LEFT JOIN last_vals v ON v.event_type = g.event_type AND v.hour = g.hour
    """,
    tags=("temporal", "resample", "gapfill"),
)
def gap_fill_forward(spark, sf_dir):
    """Regular hourly series per event_type with forward fill: every
    hour between a type's first and last event gets the latest observed
    `value` (ties within an hour broken by (ts, event_id) so the pick is
    deterministic), and `filled` marks the gap hours that carried no
    event. The standard resample step before windowed feature extraction
    over irregular streams.

    Scale shape: the per-(type, hour) last-pick and the forward-fill
    window both partition by event_type — at 100 TB the partition key
    must widen (type × day) and the fill seeded per chunk from the
    previous chunk's closing row; the grid explode is bounds-driven
    (one sequence per type), never a cross join against a global
    calendar table.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "value",
        "ts",
        "event_id",
    )
    w_pick = Window.partitionBy("event_type", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last_vals = (
        ev.withColumn("rn", F.row_number().over(w_pick))
        .where(F.col("rn") == 1)
        .select("event_type", "hour", "value")
    )
    grid = (
        last_vals.groupBy("event_type")
        .agg(F.min("hour").alias("mn"), F.max("hour").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w_fill = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(last_vals, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.last("value", ignorenulls=True).over(w_fill).alias("value"),
        F.col("value").isNull().alias("filled"),
    )


@query(
    "ohlc_bars_hourly",
    sql="""
    WITH x AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket, value,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts, event_id
               ) AS rn,
               COUNT(*) OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
               ) AS cnt
        FROM events
    )
    SELECT event_type, bucket,
           MAX(CASE WHEN rn = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn = cnt THEN value END) AS close,
           COUNT(*) AS n_events
    FROM x GROUP BY event_type, bucket
    """,
    tags=("temporal", "ohlc"),
)
def ohlc_bars_hourly(spark, sf_dir):
    """Hourly open/high/low/close bars of `value` per event_type — the
    canonical downsampling of a numeric event stream (finance bars,
    sensor rollups). Open/close are the first/last event by (ts,
    event_id) within the bar, so the pick is deterministic under
    timestamp ties.

    One shuffle on (event_type, hour): the ordered window (row_number +
    partition count share one sort) and the final aggregate hash-
    partition on the same key, and AQE coalesces them. High/low/count
    could come straight from a hash aggregate; open/close need the
    ordered pick, and riding them through one window keeps the plan to
    a single sort rather than a separate min_by/max_by pass.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "value",
        "ts",
        "event_id",
    )
    w_ord = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    w_all = Window.partitionBy("event_type", "bucket")
    x = ev.select(
        "event_type",
        "bucket",
        "value",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("cnt"),
    )
    return x.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn") == F.col("cnt"), F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )
