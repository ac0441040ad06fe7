"""Operational/maintenance batch 2: data-skipping effectiveness,
version retention planning, and join-skew profiling.

- zonemap_prune_stats    how many simulated files a date predicate can
                         skip from min/max zone maps alone — the
                         measurement that justifies (or refutes) a
                         re-clustering pass (zorder_layout_buckets'
                         diagnostic twin)
- snapshot_retention_plan  keep/expire verdicts for per-customer order
                         versions under a "latest 2 + last of month"
                         policy — the snapshot-expiry planner of any
                         versioned table format
- skew_key_profile       heaviest join keys with exact ppm shares and a
                         cross-multiplied skew factor — the pre-join
                         diagnostic that decides salting vs AQE

All exact integers; shares are ppm quotients, the skew test is
cross-multiplied (max * n_keys vs factor * total), and dates reduce to
epoch days before comparison.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_ZM_FILE_KEYS = 512
_ZM_CUTOFF = "1995-03-15"  # the Q3-shape ship cutoff


_ZM_DATE_DAYS = 32  # date-clustered layout: one file per 32-day band


def _zm_sql_arm(layout: str, file_expr: str) -> str:
    return f"""
    SELECT '{layout}' AS layout, verdict, COUNT(*) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST((1000000 * COUNT(*)) // (SUM(COUNT(*)) OVER ()) AS BIGINT)
               AS files_ppm
    FROM (
        SELECT file_id, n_rows,
               CASE
                   WHEN min_day >= DATE '{_ZM_CUTOFF}' - DATE '1970-01-01'
                       THEN 'skip'
                   WHEN max_day < DATE '{_ZM_CUTOFF}' - DATE '1970-01-01'
                       THEN 'full'
                   ELSE 'partial'
               END AS verdict
        FROM (
            SELECT {file_expr} AS file_id,
                   COUNT(*) AS n_rows,
                   MIN(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                       AS min_day,
                   MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                       AS max_day
            FROM orders GROUP BY 1
        )
    ) GROUP BY verdict
    """


@query(
    "zonemap_prune_stats",
    sql="\nUNION ALL\n".join(
        [
            _zm_sql_arm("keyorder", f"o_orderkey // {_ZM_FILE_KEYS}"),
            _zm_sql_arm(
                "dateorder",
                "(CAST(o_orderdate AS DATE) - DATE '1970-01-01') "
                f"// {_ZM_DATE_DAYS}",
            ),
        ]
    ),
    tags=("maintenance", "layout", "pruning"),
)
def zonemap_prune_stats(spark, sf_dir):
    """Zone-map (min/max) pruning effectiveness for the predicate
    o_orderdate < 1995-03-15 under TWO simulated file layouts —
    key-ordered (512-key files) vs date-clustered (32-day files): per
    (layout, verdict) — 'skip' (no row can match: min >= cutoff),
    'full' (every row matches: the scan can also skip the FILTER),
    'partial' — file count, row mass, and exact ppm of files. The
    key-ordered arm shows ~everything partial (every file spans the
    whole date range); the date-clustered arm shows most files
    skip-or-full — the side-by-side number that justifies a date
    re-cluster (zorder_layout_buckets) and then verifies its win.

    Exactness: dates collapse to integer epoch days before any
    comparison; shares are integer ppm (windowed per layout arm over
    <= 3 rows). Scale shape: two map-side-collapsed scans to file
    inventories, grouped reduces to <= 3 rows each.
    """
    cutoff_days = F.datediff(F.lit(_ZM_CUTOFF), F.lit("1970-01-01"))
    orders = read_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))

    def arm(layout: str, file_col):
        files = orders.groupBy(file_col.alias("file_id")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(day).alias("min_day"),
            F.max(day).alias("max_day"),
        )
        verdicts = files.select(
            "n_rows",
            F.when(F.col("min_day") >= cutoff_days, F.lit("skip"))
            .when(F.col("max_day") < cutoff_days, F.lit("full"))
            .otherwise(F.lit("partial"))
            .alias("verdict"),
        )
        agg = verdicts.groupBy("verdict").agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_rows").cast("long").alias("n_rows"),
        )
        return agg.select(
            F.lit(layout).alias("layout"),
            "verdict",
            "n_files",
            "n_rows",
            F.expr("(1000000 * n_files) div (sum(n_files) over ())")
            .cast("long")
            .alias("files_ppm"),
        )

    return arm(
        "keyorder", F.expr(f"o_orderkey div {_ZM_FILE_KEYS}")
    ).unionByName(
        arm("dateorder", F.floor(day / _ZM_DATE_DAYS).cast("long"))
    )


@query(
    "snapshot_retention_plan",
    sql="""
    WITH v AS (
        SELECT o_custkey AS custkey, o_orderkey AS orderkey,
               CAST(o_orderdate AS DATE) AS vday,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(o_orderdate AS DATE) DESC, o_orderkey DESC
               ) AS rank_desc,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey,
                                date_trunc('month', CAST(o_orderdate AS DATE))
                   ORDER BY CAST(o_orderdate AS DATE) DESC, o_orderkey DESC
               ) AS rn_month
        FROM orders
    )
    SELECT custkey, orderkey, vday, rank_desc,
           rn_month = 1 AS last_of_month,
           rank_desc <= 2 OR rn_month = 1 AS keep
    FROM v
    """,
    tags=("maintenance", "retention", "window"),
)
def snapshot_retention_plan(spark, sf_dir):
    """Version-retention verdicts treating each customer's orders as
    snapshots of their state: keep the 2 most recent versions plus the
    last version of every calendar month, expire the rest — the expiry
    planner every versioned table format (snapshot logs, SCD2 stores)
    runs before vacuuming. Two deterministic windows (date desc,
    orderkey desc tiebreak); month boundaries via date_trunc, which
    both engines define identically on DATEs.

    Scale shape: two windows sharing the customer partitioning — one
    shuffle total; no joins, no global ordering.
    """
    v = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.to_date("o_orderdate").alias("vday"),
    )
    order = [F.col("vday").desc(), F.col("orderkey").desc()]
    w_all = Window.partitionBy("custkey").orderBy(*order)
    w_month = Window.partitionBy(
        "custkey", F.date_trunc("month", F.col("vday"))
    ).orderBy(*order)
    ranked = v.select(
        "custkey",
        "orderkey",
        "vday",
        F.row_number().over(w_all).alias("rank_desc"),
        F.row_number().over(w_month).alias("rn_month"),
    )
    return ranked.select(
        "custkey",
        "orderkey",
        "vday",
        "rank_desc",
        (F.col("rn_month") == 1).alias("last_of_month"),
        ((F.col("rank_desc") <= 2) | (F.col("rn_month") == 1)).alias(
            "keep"
        ),
    )


_SKEW_TOPK = 20
_SKEW_FACTOR = 4  # flag keys heavier than 4x the mean key mass


@query(
    "skew_key_profile",
    sql=f"""
    WITH k AS (
        SELECT l_partkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS total,
               COUNT(*) AS n_keys
        FROM k
    ),
    top AS (
        SELECT key, cnt FROM k
        ORDER BY cnt DESC, key LIMIT {_SKEW_TOPK}
    )
    SELECT t.key, t.cnt,
           CAST((1000000 * t.cnt) // g.total AS BIGINT) AS share_ppm,
           t.cnt * g.n_keys > {_SKEW_FACTOR} * g.total AS skewed
    FROM top t CROSS JOIN tot g
    """,
    tags=("maintenance", "skew", "diagnostics"),
)
def skew_key_profile(spark, sf_dir):
    """The pre-join skew diagnostic: the 20 heaviest l_partkey join
    keys with their exact ppm share of the fact table and a
    cross-multiplied skew flag (cnt * n_keys > 4 * total, i.e. the key
    carries over 4x the mean key mass). This is the number that decides
    between plain shuffle, AQE skew splitting, and explicit salting
    (salted_join_revenue) BEFORE the join runs — at 100 TB a single
    hot key turns one reducer into the job's critical path.

    Scale shape: per-key counts collapse map-side; the top-k is
    TakeOrderedAndProject (k-row merge, no full sort); the totals are
    ONE row broadcast-attached (the tfidf_top_terms shape).
    """
    k = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = k.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    top = k.orderBy(F.col("cnt").desc(), "key").limit(_SKEW_TOPK)
    return top.crossJoin(F.broadcast(tot)).select(
        "key",
        "cnt",
        F.expr("(1000000 * cnt) div total").cast("long").alias(
            "share_ppm"
        ),
        (
            F.col("cnt") * F.col("n_keys")
            > _SKEW_FACTOR * F.col("total")
        ).alias("skewed"),
    )
