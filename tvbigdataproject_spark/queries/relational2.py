"""Round-2 relational additions: explicit grouping sets with grouping_id,
distribution window functions (ntile / percent_rank / cume_dist), and
map-typed JSON access (F11's map_* surface).

All three are oracle-checked. percent_rank/cume_dist are exact rationals
((rank-1)/(n-1), rank/n) over a totally-ordered window, so the double
comparison is bitwise-safe without rounding.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.queries._stable import sql_stable_sum, stable_sum
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "agg_grouping_sets",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           {sql_stable_sum('l_quantity', 2)} AS sum_qty,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("agg",),
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (A7 beyond cube/rollup) with the
    grouping_id bitmask distinguishing aggregation levels — the
    bitmask contract (0 = most detailed, high bits = rolled up) is
    identical in Spark and DuckDB/Postgres."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().alias("gid"),
            stable_sum(F.col("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@query(
    "window_rank_stats",
    sql="""
    SELECT c_custkey, c_nationkey,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cum_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window",),
)
def window_rank_stats(spark, sf_dir):
    """Distribution window functions (W1): per-nation account-balance
    quartile, percent rank, cumulative distribution. The order key
    carries a c_custkey tiebreak so every rank is total and the rational
    outputs are engine-independent."""
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


@query(
    "map_props_stats",
    sql="""
    SELECT event_id,
           len(json_keys(props)) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
    tags=("scalar", "json", "map"),
)
def map_props_stats(spark, sf_dir):
    """Map-typed JSON access (F11 map_*): parse props once into
    map<string,string>, then map_keys/element access — the typed
    alternative to repeated get_json_object string probing."""
    ev = read_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    parsed = ev.select("event_id", m.alias("m"))
    return parsed.select(
        "event_id",
        F.size(F.map_keys("m")).alias("n_keys"),
        F.concat_ws(",", F.array_sort(F.map_keys("m"))).alias("keys_csv"),
        F.element_at("m", "k").cast("long").alias("k_value"),
    )
