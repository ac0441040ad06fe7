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


@query(
    "cusum_changepoint",
    sql="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    x AS (
        SELECT event_type, day, cnt,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY day
                              ROWS UNBOUNDED PRECEDING) AS cum,
               COUNT(*) OVER (PARTITION BY event_type) AS n_days,
               SUM(cnt) OVER (PARTITION BY event_type) AS total
        FROM daily
    ),
    d AS (
        SELECT event_type, day, n_days, total,
               n_days * cum - t * total AS dev,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY abs(n_days * cum - t * total) DESC, day
               ) AS rn
        FROM x
    )
    SELECT event_type, day AS cp_day, n_days, total AS total_events,
           abs(dev) AS cusum_dev,
           CAST(CASE WHEN dev > 0 THEN 1 WHEN dev < 0 THEN -1 ELSE 0 END
                AS INT) AS dev_sign
    FROM d WHERE rn = 1
    """,
    tags=("temporal", "anomaly", "changepoint"),
)
def cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint per event_type: the day maximizing the absolute
    cumulative deviation of the daily event count from its series mean
    — the classic offline level-shift estimator (argmax_t |S_t|).

    Integer-exact: the mean is never materialized — the deviation is
    kept in cross-multiplied form ``n_days * prefix_t - t * total``
    (BIGINT; ~2^13 days x 2^40 events stays far under 2^63), so the
    argmax and the reported magnitude are bitwise engine-portable. Ties
    break on the earlier day.

    Scale shape: the corpus-sized scan collapses map-side into the
    (type, day) daily grid — the window/argmax run on n_types x n_days
    rows, never on raw events. At 100 TB the only full-data cost is the
    one partial-aggregated shuffle of the daily grid.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("event_type")
    x = daily.select(
        "event_type",
        "day",
        F.row_number().over(w_ord).alias("t"),
        F.sum("cnt").over(w_cum).alias("cum"),
        F.count(F.lit(1)).over(w_all).alias("n_days"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    dev = F.col("n_days") * F.col("cum") - F.col("t") * F.col("total")
    d = x.select(
        "event_type",
        "day",
        "n_days",
        "total",
        dev.alias("dev"),
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(
                F.abs(dev).desc(), F.col("day").asc()
            )
        )
        .alias("rn"),
    )
    return d.where(F.col("rn") == 1).select(
        "event_type",
        F.col("day").alias("cp_day"),
        "n_days",
        F.col("total").alias("total_events"),
        F.abs(F.col("dev")).alias("cusum_dev"),
        F.when(F.col("dev") > 0, F.lit(1))
        .when(F.col("dev") < 0, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("dev_sign"),
    )
