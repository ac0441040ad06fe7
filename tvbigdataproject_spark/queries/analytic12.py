"""Round-9 batch 12: classical-inference and forecasting-prep analytics.

- anova_f_order_value       one-way ANOVA F + eta^2 of order value
                            across customer segments — the parametric
                            twin of kruskal_wallis_value
- stl_weekly_decompose      seasonal/trend/remainder decomposition of
                            daily revenue (centered 7-day MA trend,
                            day-of-week seasonal means) — the STL-lite
                            pre-pass behind every seasonality-aware
                            monitor
- conformal_interval_coverage  split-conformal prediction audit:
                            calibration-quantile half-width + held-out
                            empirical coverage per segment

All integer-exact (no transcendentals): cents sums, 128-bit squared
sums through the wide split-cast, and type-1 quantiles as integer
cross-products on bounded value grids.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries._stable import (
    sql_huge_to_double_wide,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# ---------------------------------------------------------------- Q8

_SEGMENTS = (
    "AUTOMOBILE",
    "BUILDING",
    "FURNITURE",
    "HOUSEHOLD",
    "MACHINERY",
)


def _anova_tail(huge_to_double) -> str:
    """Shared double-space tail: fixed-order between-group sum.

    A SUM over the 5 per-group terms would be addition-order-dependent;
    the segment domain is fixed, so pivot to one row and add left to
    right (the BM25 fixed-order-pivot convention, llm_ops9.py).
    """
    terms = " + ".join(
        f"COALESCE({huge_to_double(f's2_{s}')} / nd_{s},"
        " CAST(0 AS DOUBLE))"
        for s in _SEGMENTS
    )
    k = " + ".join(
        f"(CASE WHEN nd_{s} IS NULL THEN 0 ELSE 1 END)" for s in _SEGMENTS
    )
    return f"(({terms})) AS sum_sg2_over_n, ({k}) AS k"


@query(
    "anova_f_order_value",
    sql=f"""
    WITH o AS (
        SELECT c.c_mktsegment AS segment,
               CAST(ROUND(o.o_totalprice) AS BIGINT) AS x
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    g AS (
        SELECT segment, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s,
               SUM(CAST(x AS HUGEINT) * x) AS sq
        FROM o GROUP BY 1
    ),
    piv AS (
        SELECT {', '.join(
            f"MAX(CASE WHEN segment = '{s}' THEN CAST(s AS HUGEINT) * s END)"
            f" AS s2_{s}, "
            f"MAX(CASE WHEN segment = '{s}' THEN CAST(n AS DOUBLE) END)"
            f" AS nd_{s}"
            for s in _SEGMENTS)},
            CAST(SUM(n) AS BIGINT) AS n_total,
            CAST(SUM(s) AS BIGINT) AS s_total,
            SUM(sq) AS sq_total
        FROM g
    ),
    t AS (
        SELECT n_total, s_total,
               {_anova_tail(lambda c: sql_huge_to_double_wide(c))},
               {sql_huge_to_double_wide('sq_total')} AS sq_d,
               {sql_huge_to_double_wide(
                   'CAST(s_total AS HUGEINT) * s_total')} AS st2_d,
               CAST(n_total AS DOUBLE) AS nd
        FROM piv
    )
    SELECT n_total, k,
           sum_sg2_over_n - st2_d / nd AS ss_between,
           sq_d - sum_sg2_over_n AS ss_within,
           (sum_sg2_over_n - st2_d / nd) / (sq_d - st2_d / nd) AS eta_sq,
           ((sum_sg2_over_n - st2_d / nd) / (k - 1))
               / ((sq_d - sum_sg2_over_n) / (n_total - k)) AS f_stat
    FROM t
    """,
    tags=("analytics", "stats", "inference"),
)
def anova_f_order_value(spark, sf_dir):
    """One-way ANOVA across customer segments on order value (whole
    dollars): F statistic, eta-squared effect size, and the SS
    decomposition — the parametric counterpart of the suite's
    Kruskal-Wallis rank test (same design, mean-based instead of
    rank-based).

    Exactness: group sums are exact BIGINTs and squared sums exact
    128-bit integers surfaced through the wide split-cast; the
    between-group term sums the FIXED 5-segment pivot left-to-right
    (fixed-order-pivot convention) because a float SUM would be
    order-dependent. F and eta^2 are then identically-spelled IEEE
    ratios of those agreed doubles.

    Scale shape: one join + one map-side-combined aggregate to a 5-row
    table, then a single-row pivot — nothing downstream of the
    aggregate sees data volume.
    """
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    o = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("o_totalprice")).cast("long").alias("x"),
    )
    g = o.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sq"),
    )
    piv = g.agg(
        *[
            expr
            for s in _SEGMENTS
            for expr in (
                F.max(
                    F.when(
                        F.col("segment") == s,
                        F.col("s").cast("decimal(38,0)") * F.col("s"),
                    )
                ).alias(f"s2_{s}"),
                F.max(
                    F.when(F.col("segment") == s, F.col("n").cast("double"))
                ).alias(f"nd_{s}"),
            )
        ],
        F.sum("n").cast("long").alias("n_total"),
        F.sum("s").cast("long").alias("s_total"),
        F.sum("sq").alias("sq_total"),
    )
    from tvbigdataproject_spark.queries._stable import dec_to_double_wide

    terms = None
    for s in _SEGMENTS:
        term = F.coalesce(
            dec_to_double_wide(F.col(f"s2_{s}")) / F.col(f"nd_{s}"),
            F.expr("CAST(0 AS DOUBLE)"),
        )
        terms = term if terms is None else terms + term
    k = None
    for s in _SEGMENTS:
        piece = F.expr(f"(CASE WHEN nd_{s} IS NULL THEN 0 ELSE 1 END)")
        k = piece if k is None else k + piece
    t = piv.select(
        "n_total",
        "s_total",
        terms.alias("sum_sg2_over_n"),
        k.alias("k"),
        dec_to_double_wide(F.col("sq_total")).alias("sq_d"),
        dec_to_double_wide(
            F.col("s_total").cast("decimal(38,0)") * F.col("s_total")
        ).alias("st2_d"),
        F.col("n_total").cast("double").alias("nd"),
    )
    return t.selectExpr(
        "n_total",
        "k",
        "sum_sg2_over_n - st2_d / nd AS ss_between",
        "sq_d - sum_sg2_over_n AS ss_within",
        "(sum_sg2_over_n - st2_d / nd) / (sq_d - st2_d / nd) AS eta_sq",
        "((sum_sg2_over_n - st2_d / nd) / (k - 1))"
        " / ((sq_d - sum_sg2_over_n) / (n_total - k)) AS f_stat",
    )


# ---------------------------------------------------------------- Q9


@query(
    "stl_weekly_decompose",
    sql="""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM orders GROUP BY 1
    ),
    tr AS (
        SELECT day, rev_c,
               CAST(SUM(rev_c) OVER w AS BIGINT) AS sum7,
               COUNT(*) OVER w AS n7
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                     AND 3 FOLLOWING)
    ),
    d AS (
        SELECT day, rev_c, sum7, 7 * rev_c - sum7 AS d_scaled,
               isodow(CAST(day AS DATE)) AS dow
        FROM tr WHERE n7 = 7
    ),
    seas AS (
        SELECT dow, CAST(SUM(d_scaled) AS BIGINT) AS num,
               COUNT(*) AS cnt
        FROM d GROUP BY 1
    )
    SELECT d.day, d.rev_c,
           CAST(d.sum7 AS DOUBLE) / CAST(7 AS DOUBLE) AS trend,
           CAST(seas.num AS DOUBLE)
               / (CAST(7 AS DOUBLE) * CAST(seas.cnt AS DOUBLE))
               AS seasonal,
           CAST(d.d_scaled AS DOUBLE) / CAST(7 AS DOUBLE)
               - CAST(seas.num AS DOUBLE)
               / (CAST(7 AS DOUBLE) * CAST(seas.cnt AS DOUBLE))
               AS remainder
    FROM d JOIN seas ON d.dow = seas.dow
    """,
    tags=("analytics", "timeseries", "forecast"),
)
def stl_weekly_decompose(spark, sf_dir):
    """STL-lite decomposition of daily order revenue: trend = centered
    7-day moving average, seasonal = day-of-week mean of the detrended
    series, remainder = what's left — the classical decomposition that
    has to run BEFORE any anomaly threshold is set on seasonal data
    (the suite's zscore/ewma monitors assume it).

    Exactness: revenue is exact integer cents; the detrended series is
    kept as the INTEGER 7x - sum7 (scaled by 7, never a rational MA),
    so the day-of-week means and the remainder are single divisions of
    exact integers, spelled identically in both engines. Day-of-week
    is ISO (Spark weekday()+1 == DuckDB isodow).

    Scale shape: one aggregate to the bounded day grid; the 7-row
    frame and the 7-row DOW table are calendar-bounded at any SF (the
    unpartitioned window is on the allowlisted day-grid class).
    """
    from pyspark.sql import Window as W

    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_c")
    )
    w = W.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "rev_c",
        F.sum("rev_c").over(w).cast("long").alias("sum7"),
        F.count(F.lit(1)).over(w).alias("n7"),
    )
    d = tr.where(F.col("n7") == 7).select(
        "day",
        "rev_c",
        "sum7",
        (7 * F.col("rev_c") - F.col("sum7")).alias("d_scaled"),
        (F.weekday(F.col("day").cast("date")) + 1).alias("dow"),
    )
    seas = d.groupBy("dow").agg(
        F.sum("d_scaled").cast("long").alias("num"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return d.join(F.broadcast(seas), "dow").selectExpr(
        "day",
        "rev_c",
        "CAST(sum7 AS DOUBLE) / CAST(7 AS DOUBLE) AS trend",
        "CAST(num AS DOUBLE) / (CAST(7 AS DOUBLE) * CAST(cnt AS DOUBLE))"
        " AS seasonal",
        "CAST(d_scaled AS DOUBLE) / CAST(7 AS DOUBLE)"
        " - CAST(num AS DOUBLE)"
        " / (CAST(7 AS DOUBLE) * CAST(cnt AS DOUBLE)) AS remainder",
    )


# --------------------------------------------------------------- Q10


@query(
    "conformal_interval_coverage",
    sql="""
    WITH o AS (
        SELECT c.c_mktsegment AS segment,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS x_c,
               ('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 4))
                   ::BIGINT % 4 AS part
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    pred AS (
        SELECT segment,
               COUNT(*) AS n_train,
               CAST(SUM(x_c) AS BIGINT) // COUNT(*) AS pred_c
        FROM o WHERE part <= 1 GROUP BY 1
    ),
    cal AS (
        SELECT o.segment, abs(o.x_c - pred.pred_c) // 100 AS r
        FROM o JOIN pred ON o.segment = pred.segment
        WHERE o.part = 2
    ),
    rh AS (SELECT segment, r, COUNT(*) AS cnt FROM cal GROUP BY 1, 2),
    cum AS (
        SELECT segment, r,
               CAST(SUM(cnt) OVER (PARTITION BY segment ORDER BY r)
                    AS BIGINT) AS cw,
               CAST(SUM(cnt) OVER (PARTITION BY segment) AS BIGINT)
                   AS n_cal
        FROM rh
    ),
    q AS (
        SELECT segment, MAX(n_cal) AS n_cal,
               MIN(CASE WHEN 10 * cw >= 9 * (n_cal + 1) THEN r END)
                   AS qhat_dollars
        FROM cum GROUP BY 1
    )
    SELECT q.segment, pred.n_train, q.n_cal, pred.pred_c,
           q.qhat_dollars,
           COUNT(*) AS n_test,
           CAST(SUM(CASE WHEN abs(o.x_c - pred.pred_c) // 100
                              <= q.qhat_dollars
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
           CAST(SUM(CASE WHEN abs(o.x_c - pred.pred_c) // 100
                              <= q.qhat_dollars
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS coverage
    FROM o
    JOIN pred ON o.segment = pred.segment
    JOIN q ON o.segment = q.segment
    WHERE o.part = 3
    GROUP BY 1, 2, 3, 4, 5
    """,
    tags=("analytics", "stats", "ml-eval"),
)
def conformal_interval_coverage(spark, sf_dir):
    """Split-conformal prediction audit per customer segment: hash
    orders into train/calibration/test, predict order value by the
    train-split segment mean, take the 90% calibration quantile of
    absolute residuals as the interval half-width, and report held-out
    coverage — the distribution-free uncertainty calibration every
    deployed regressor ships with (coverage should land near 0.9
    regardless of the residual distribution).

    Exactness: the split is the portable md5 hash; the prediction is
    the INTEGER floor-mean of train cents; residuals are exact integer
    dollars; the conformal quantile is the type-1 pick via the integer
    cross-product 10*cw >= 9*(n+1) (the weighted-median convention);
    coverage is one final division of exact integers.

    Scale shape: everything is keyed aggregates plus a 5-row broadcast
    of per-segment predictions; the quantile's cumulative window runs
    per segment over the residual DOLLAR grid, bounded by the price
    domain at any SF (the l_moments bound class).
    """
    from pyspark.sql import Window as W

    from tvbigdataproject_spark.functions.hashing import hex16_hash

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    o = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x_c"),
        (hex16_hash(F.col("o_orderkey").cast("string")) % 4).alias("part"),
    )
    pred = (
        o.where(F.col("part") <= 1)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.expr("CAST(SUM(x_c) AS BIGINT) div COUNT(*)").alias(
                "pred_c"
            ),
        )
    )
    cal = (
        o.where(F.col("part") == 2)
        .join(F.broadcast(pred), "segment")
        .select(
            "segment",
            F.expr("abs(x_c - pred_c) div 100").alias("r"),
        )
    )
    rh = cal.groupBy("segment", "r").agg(F.count(F.lit(1)).alias("cnt"))
    cum = rh.select(
        "segment",
        "r",
        F.sum("cnt")
        .over(W.partitionBy("segment").orderBy("r"))
        .cast("long")
        .alias("cw"),
        F.sum("cnt")
        .over(W.partitionBy("segment"))
        .cast("long")
        .alias("n_cal"),
    )
    q = cum.groupBy("segment").agg(
        F.max("n_cal").alias("n_cal"),
        F.min(
            F.when(
                10 * F.col("cw") >= 9 * (F.col("n_cal") + 1), F.col("r")
            )
        ).alias("qhat_dollars"),
    )
    test = (
        o.where(F.col("part") == 3)
        .join(F.broadcast(pred), "segment")
        .join(F.broadcast(q), "segment")
    )
    covered = F.when(
        F.expr("abs(x_c - pred_c) div 100") <= F.col("qhat_dollars"), 1
    ).otherwise(0)
    return test.groupBy(
        "segment", "n_train", "n_cal", "pred_c", "qhat_dollars"
    ).agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(covered).cast("long").alias("n_covered"),
        (
            F.sum(covered).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("coverage"),
    )
