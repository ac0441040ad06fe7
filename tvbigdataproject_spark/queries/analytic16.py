"""Analytics batch 16: extreme-value statistics, heavy-tail index
estimation, parametric survival fitting, and time-constrained funnels —
the tail-risk / duration tier on top of the existing moments, survival
and funnel families:

- gumbel_daily_value_extremes  method-of-moments Gumbel fit to the
                               daily event-value maxima + exceedance
                               probability at 2x the mean max — the
                               block-maxima EVT readout ("how often
                               will a day double the typical peak")
- hill_tail_index_orders       Hill estimator of the order-value tail
                               index over the top-k order statistics —
                               the standard "how heavy is this tail"
                               number (alpha ~ 1-2: very heavy)
- weibull_median_rank_fit      Weibull shape/scale via median-rank
                               regression on repurchase gaps — the
                               parametric companion to the KM/NA
                               curves (shape < 1 = churn decelerates,
                               > 1 = wear-out)
- timed_funnel_conversion      view -> click(<=1h) -> purchase(<=24h)
                               per-user funnel with DEADLINES — the
                               untimed funnel overcounts conversions
                               that took a week

Counts/ranks/cents stay exact integers (decimal-128 where squares and
cross-moments can overflow); every transcendental goes through the
portable ln/exp kernels with per-row 1e9-scaled-integer rounding before
any cross-row float sum, so all four are full-value oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.portable import (
    apply_stages,
    pexp_stages,
    plog_stages,
    sql_wrap_stages,
)
from tvbigdataproject_spark.queries._stable import (
    dec_to_double_wide,
    sql_huge_to_double_wide,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# ---------------------------------------------------------------- Q73

# method-of-moments Gumbel: beta = s * sqrt(6)/pi, mu = m - gamma*beta.
# gamma (Euler-Mascheroni) and pi enter as 16-digit decimal literals —
# both engines round the same decimal to the same double.
_GB_PI = "CAST(3.141592653589793 AS DOUBLE)"
_GB_GAMMA = "CAST(0.5772156649015329 AS DOUBLE)"
_GB_MEAN = "CAST(s_cents AS DOUBLE) / CAST(n_days AS DOUBLE)"
_GB_VAR = (
    f"(sq_d / CAST(n_days AS DOUBLE) - ({_GB_MEAN}) * ({_GB_MEAN}))"
)
_GB_BETA = f"sqrt({_GB_VAR}) * sqrt(CAST(6 AS DOUBLE)) / {_GB_PI}"
_GB_MU = f"({_GB_MEAN}) - {_GB_GAMMA} * ({_GB_BETA})"
# exceedance at x0 = 2 * mean: P = 1 - exp(-exp(-(x0-mu)/beta)); the
# inner exponent is clamped to the portable-exp domain (a physically
# impossible z > 60 would otherwise leave the ladder)
_GB_Z = "(CAST(2 AS DOUBLE) * xm - mu) / beta"


def _gumbel_sql() -> str:
    daily = """
    SELECT CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS mx
    FROM events GROUP BY CAST(ts AS DATE)
    """
    mom = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(mx) AS BIGINT) AS s_cents,
           {sql_huge_to_double_wide('SUM(CAST(mx AS HUGEINT) * mx)')}
               AS sq_d
    FROM ({daily})
    """
    fitted = f"""
    SELECT n_days, {_GB_MEAN} AS xm, {_GB_MU} AS mu, beta FROM
    (SELECT *, {_GB_BETA} AS beta FROM ({mom}))
    """
    inner = sql_wrap_stages(
        f"(SELECT *, LEAST(CAST(60 AS DOUBLE),"
        f" CAST(0 AS DOUBLE) - ({_GB_Z})) AS z_neg FROM ({fitted}))",
        pexp_stages("z_neg", "_ei", "_gb1_"),
    )
    outer = sql_wrap_stages(
        f"(SELECT * FROM {inner})",
        pexp_stages("CAST(0 AS DOUBLE) - _ei", "_eo", "_gb2_"),
    )
    return f"""
    SELECT n_days, mu, beta,
           CAST(1 AS DOUBLE) - _eo AS p_exceed_2mean
    FROM {outer}
    """


@query(
    "gumbel_daily_value_extremes",
    sql=_gumbel_sql(),
    tags=("analytics", "stats", "extremes"),
)
def gumbel_daily_value_extremes(spark, sf_dir):
    """Block-maxima extreme-value fit: the daily MAXIMUM event value
    (exact cents) is Gumbel-distributed under EVT for light-tailed
    parents; method-of-moments gives scale beta = s*sqrt(6)/pi and
    location mu = m - gamma*beta, and the payoff number is
    P(daily max > 2 * mean max) = 1 - exp(-exp(-(x0-mu)/beta)) — the
    capacity-planning exceedance probability.

    Exactness: daily maxima and their sum are exact integers; the
    squared sum goes through 128-bit and the agreed wide cast; mu/beta
    and the double-exponential are shared expression text through the
    portable exp kernel (inner exponent clamped to the ladder domain).

    Scale shape: events collapse to the bounded day grid map-side;
    moments are one aggregate row; the fit is scalar arithmetic.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.max(F.round(F.col("value") * 100).cast("long")).alias("mx")
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("mx").cast("long").alias("s_cents"),
        F.sum(F.col("mx").cast("decimal(38,0)") * F.col("mx")).alias("sq"),
    ).select(
        "n_days", "s_cents", dec_to_double_wide(F.col("sq")).alias("sq_d")
    )
    fitted = mom.selectExpr("*", f"{_GB_BETA} AS beta").selectExpr(
        "n_days", f"{_GB_MEAN} AS xm", f"{_GB_MU} AS mu", "beta"
    )
    inner = apply_stages(
        fitted.selectExpr(
            "*",
            f"LEAST(CAST(60 AS DOUBLE), CAST(0 AS DOUBLE) - ({_GB_Z}))"
            " AS z_neg",
        ),
        pexp_stages("z_neg", "_ei", "_gb1_"),
    )
    outer = apply_stages(
        inner, pexp_stages("CAST(0 AS DOUBLE) - _ei", "_eo", "_gb2_")
    )
    return outer.selectExpr(
        "n_days", "mu", "beta", "CAST(1 AS DOUBLE) - _eo AS p_exceed_2mean"
    )


# ---------------------------------------------------------------- Q74

_HILL_K = 100
# Hill estimator over the top-k order statistics x_1 >= ... >= x_k:
# H = mean over i < k of (ln x_i - ln x_k); alpha = 1/H. Per-row lns
# are rounded once to 1e9-scaled ints so the cross-row sum is exact.
_HILL_ALPHA = (
    "CAST(1 AS DOUBLE) /"
    " (CAST(s_ln AS DOUBLE) / CAST(1000000000 AS DOUBLE)"
    f" / CAST({_HILL_K - 1} AS DOUBLE))"
)


def _hill_sql() -> str:
    top = f"""
    SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
           ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
               AS rk
    FROM orders
    QUALIFY rk <= {_HILL_K}
    """
    both = sql_wrap_stages(
        f"""(SELECT a.cents, a.rk, b.cents AS kth FROM ({top}) a
         CROSS JOIN (SELECT cents FROM ({top}) WHERE rk = {_HILL_K}) b
         WHERE a.rk < {_HILL_K})""",
        plog_stages("CAST(a_ratio AS DOUBLE)", "_lnr", "_hl_"),
    )
    # ratio spelled as one double division of exact ints (shared)
    both = both.replace(
        "a_ratio", "CAST(cents AS DOUBLE) / CAST(kth AS DOUBLE)"
    )
    return f"""
    SELECT {_HILL_K} AS k_top, s_ln,
           {_HILL_ALPHA} AS hill_alpha
    FROM (SELECT CAST(SUM(CAST(ROUND(_lnr * 1000000000) AS BIGINT))
                 AS BIGINT) AS s_ln
          FROM {both})
    """


@query(
    "hill_tail_index_orders",
    sql=_hill_sql(),
    tags=("analytics", "stats", "tails"),
)
def hill_tail_index_orders(spark, sf_dir):
    """Hill estimator of the order-value tail index over the top-{k}
    order totals: alpha = 1 / mean(ln(x_i / x_k)), i < k — the standard
    answer to "how heavy is the revenue tail" (alpha near 1 = a few
    orders dominate totals; alpha > 3 = tail hardly matters). The
    order-statistics companion to power_law_alpha_tokens' frequency
    MLE.

    Determinism: the top-{k} is a ROW_NUMBER total order on
    (o_totalprice DESC, o_orderkey); each ln ratio goes through the
    portable kernel and is rounded ONCE to a 1e9-scaled int, so the
    mean is an exact integer sum — no order-dependent float
    accumulation.

    Scale shape: one TakeOrdered top-{k} (no global sort), a one-row
    broadcast of the k-th value, and a {k}-row scalar pass.
    """
    orders = read_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    top = (
        orders.select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            F.col("o_totalprice"),
            F.col("o_orderkey"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(_HILL_K)
        .select(
            "cents",
            F.row_number()
            .over(Window.orderBy(F.col("o_totalprice").desc(), "o_orderkey"))
            .alias("rk"),
        )
    )
    kth = top.where(F.col("rk") == _HILL_K).select(
        F.col("cents").alias("kth")
    )
    both = top.where(F.col("rk") < _HILL_K).crossJoin(F.broadcast(kth))
    both = apply_stages(
        both,
        plog_stages(
            "CAST(cents AS DOUBLE) / CAST(kth AS DOUBLE)", "_lnr", "_hl_"
        ),
    )
    agg = both.agg(
        F.sum(F.round(F.col("_lnr") * 1000000000).cast("long"))
        .cast("long")
        .alias("s_ln")
    )
    return agg.selectExpr(
        f"{_HILL_K} AS k_top", "s_ln", f"{_HILL_ALPHA} AS hill_alpha"
    )


hill_tail_index_orders.__doc__ = hill_tail_index_orders.__doc__.format(
    k=_HILL_K
)

# ---------------------------------------------------------------- Q75

# median-rank (Bernard) regression: F_i = (i - 0.3)/(n + 0.4),
# y = ln(-ln(1 - F)), x = ln(t). OLS slope = Weibull shape, scale =
# exp(-intercept/slope). Per-row x, y round once to 1e9-scaled ints;
# all cross-moments accumulate in decimal-128.
_WB_SCALE = 1_000_000_000
_WB_SLOPE = (
    "(CAST(n AS DOUBLE) * sxy_d - sx_d * sy_d)"
    " / (CAST(n AS DOUBLE) * sxx_d - sx_d * sx_d)"
)


def _weibull_sql() -> str:
    gaps = """
    SELECT o_custkey,
           CAST(date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                          MAX(CAST(o_orderdate AS DATE))) AS BIGINT)
               AS gap_days
    FROM orders GROUP BY 1
    HAVING COUNT(*) >= 2
       AND MIN(CAST(o_orderdate AS DATE)) < MAX(CAST(o_orderdate AS DATE))
    """
    # bucket-offset rank decomposition (the mann_whitney discipline):
    # the global rank = (#rows with a smaller gap) + the within-gap
    # row_number by custkey — the only unpartitioned window runs over
    # the DISTINCT-GAP grid (calendar-bounded), never the customers
    offs = f"""
    SELECT gap_days,
           CAST(SUM(cnt) OVER (ORDER BY gap_days
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT) AS off,
           CAST(SUM(cnt) OVER (ROWS BETWEEN UNBOUNDED PRECEDING AND
                UNBOUNDED FOLLOWING) AS BIGINT) AS n
    FROM (SELECT gap_days, COUNT(*) AS cnt FROM ({gaps}) GROUP BY 1)
    """
    ranked = f"""
    SELECT g.gap_days,
           COALESCE(o.off, 0)
               + ROW_NUMBER() OVER (PARTITION BY g.gap_days
                                    ORDER BY g.o_custkey) AS i,
           o.n
    FROM ({gaps}) g JOIN ({offs}) o ON g.gap_days = o.gap_days
    """
    fexpr = (
        "(CAST(i AS DOUBLE) - CAST(0.3 AS DOUBLE))"
        " / (CAST(n AS DOUBLE) + CAST(0.4 AS DOUBLE))"
    )
    staged = sql_wrap_stages(
        f"(SELECT * FROM ({ranked}))",
        plog_stages(f"CAST(1 AS DOUBLE) - ({fexpr})", "_ln1f", "_wb1_"),
    )
    staged = sql_wrap_stages(
        f"(SELECT * FROM {staged})",
        plog_stages("CAST(0 AS DOUBLE) - _ln1f", "_y", "_wb2_"),
    )
    staged = sql_wrap_stages(
        f"(SELECT * FROM {staged})",
        plog_stages("CAST(gap_days AS DOUBLE)", "_x", "_wb3_"),
    )
    sums = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(xi) AS BIGINT) AS sx,
           CAST(SUM(yi) AS BIGINT) AS sy,
           SUM(CAST(xi AS HUGEINT) * xi) AS sxx,
           SUM(CAST(xi AS HUGEINT) * yi) AS sxy
    FROM (SELECT CAST(ROUND(_x * {_WB_SCALE}) AS BIGINT) AS xi,
                 CAST(ROUND(_y * {_WB_SCALE}) AS BIGINT) AS yi
          FROM {staged})
    """
    # the scale product is spelled through DOUBLE casts — a bare
    # decimal literal product overflows DuckDB's DECIMAL(18) parse
    sc2 = (
        f"(CAST({_WB_SCALE} AS DOUBLE) * CAST({_WB_SCALE} AS DOUBLE))"
    )
    wide = f"""
    SELECT n,
           CAST(sx AS DOUBLE) / CAST({_WB_SCALE} AS DOUBLE) AS sx_d,
           CAST(sy AS DOUBLE) / CAST({_WB_SCALE} AS DOUBLE) AS sy_d,
           {sql_huge_to_double_wide('sxx')} / {sc2} AS sxx_d,
           {sql_huge_to_double_wide('sxy')} / {sc2} AS sxy_d
    FROM ({sums})
    """
    fitted = f"""
    SELECT n AS n_customers, shape,
           (sy_d / CAST(n AS DOUBLE) - shape * sx_d / CAST(n AS DOUBLE))
               AS intercept
    FROM (SELECT *, {_WB_SLOPE} AS shape FROM ({wide}))
    """
    out = sql_wrap_stages(
        f"""(SELECT *, (CAST(0 AS DOUBLE) - intercept) / shape AS ln_scale
         FROM ({fitted}))""",
        pexp_stages("ln_scale", "_sc", "_wb4_"),
    )
    return f"""
    SELECT n_customers, shape AS weibull_shape,
           _sc AS weibull_scale_days
    FROM {out}
    """


@query(
    "weibull_median_rank_fit",
    sql=_weibull_sql(),
    tags=("analytics", "survival", "parametric"),
)
def weibull_median_rank_fit(spark, sf_dir):
    """Weibull shape/scale fitted to the first-to-last order gap per
    repeat customer by median-rank regression (Bernard's approximation
    F_i = (i-0.3)/(n+0.4), then OLS of ln(-ln(1-F)) on ln t): the
    parametric survival readout next to the nonparametric KM/NA curves
    — shape < 1 means repurchase hazard FALLS with time (churn risk
    front-loaded), > 1 means wear-out.

    Determinism: gaps are exact day integers; ranks are a ROW_NUMBER
    total order (gap, custkey); x, y go through portable ln kernels
    and round ONCE to 1e9-scaled ints; cross-moments accumulate in
    decimal-128 with the agreed wide cast, so slope/intercept are
    shared-text doubles; the scale comes back through portable exp.

    Scale shape: one orders aggregate to per-customer gaps; ranks come
    from the bucket-offset decomposition (the mann_whitney
    discipline) — the only unpartitioned window runs over the
    distinct-gap grid (calendar-bounded), the per-customer tiebreak
    window is partitioned by gap; scalar OLS on one aggregate row.
    """
    orders = read_table(spark, sf_dir, "orders")
    gaps = (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.datediff(
                F.max(F.to_date("o_orderdate")),
                F.min(F.to_date("o_orderdate")),
            )
            .cast("long")
            .alias("gap_days"),
        )
        .where((F.col("cnt") >= 2) & (F.col("gap_days") > 0))
        .select("o_custkey", "gap_days")
    )
    from pyspark.sql import Window

    # bucket-offset rank decomposition: only the distinct-gap grid
    # (calendar-bounded) sees an unpartitioned window; the per-customer
    # row_number is partitioned by gap
    cnts = gaps.groupBy("gap_days").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("gap_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = cnts.select(
        "gap_days",
        F.sum("cnt").over(w_off).cast("long").alias("off"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
    )
    ranked = gaps.join(offs, "gap_days").select(
        "gap_days",
        (
            F.coalesce(F.col("off"), F.lit(0))
            + F.row_number().over(
                Window.partitionBy("gap_days").orderBy("o_custkey")
            )
        ).alias("i"),
        "n",
    )
    fexpr = (
        "(CAST(i AS DOUBLE) - CAST(0.3 AS DOUBLE))"
        " / (CAST(n AS DOUBLE) + CAST(0.4 AS DOUBLE))"
    )
    staged = apply_stages(
        ranked, plog_stages(f"CAST(1 AS DOUBLE) - ({fexpr})", "_ln1f", "_wb1_")
    )
    staged = apply_stages(
        staged, plog_stages("CAST(0 AS DOUBLE) - _ln1f", "_y", "_wb2_")
    )
    staged = apply_stages(
        staged, plog_stages("CAST(gap_days AS DOUBLE)", "_x", "_wb3_")
    )
    sums = staged.selectExpr(
        f"CAST(ROUND(_x * {_WB_SCALE}) AS BIGINT) AS xi",
        f"CAST(ROUND(_y * {_WB_SCALE}) AS BIGINT) AS yi",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xi").cast("long").alias("sx"),
        F.sum("yi").cast("long").alias("sy"),
        F.sum(F.col("xi").cast("decimal(38,0)") * F.col("xi")).alias("sxx"),
        F.sum(F.col("xi").cast("decimal(38,0)") * F.col("yi")).alias("sxy"),
    )
    wide = sums.select(
        "n",
        (F.col("sx").cast("double") / float(_WB_SCALE)).alias("sx_d"),
        (F.col("sy").cast("double") / float(_WB_SCALE)).alias("sy_d"),
        (
            dec_to_double_wide(F.col("sxx"))
            / (float(_WB_SCALE) * float(_WB_SCALE))
        ).alias("sxx_d"),
        (
            dec_to_double_wide(F.col("sxy"))
            / (float(_WB_SCALE) * float(_WB_SCALE))
        ).alias("sxy_d"),
    )
    fitted = wide.selectExpr("*", f"{_WB_SLOPE} AS shape").selectExpr(
        "n AS n_customers",
        "shape",
        "(sy_d / CAST(n AS DOUBLE) - shape * sx_d / CAST(n AS DOUBLE))"
        " AS intercept",
    )
    out = apply_stages(
        fitted.selectExpr(
            "*", "(CAST(0 AS DOUBLE) - intercept) / shape AS ln_scale"
        ),
        pexp_stages("ln_scale", "_sc", "_wb4_"),
    )
    return out.selectExpr(
        "n_customers", "shape AS weibull_shape", "_sc AS weibull_scale_days"
    )


# ---------------------------------------------------------------- Q76

_TF_CLICK_US = 3_600_000_000  # 1 h
_TF_BUY_US = 86_400_000_000  # 24 h
_TF_RATES = (
    "CAST(n_clicked AS DOUBLE) / CAST(n_viewed AS DOUBLE) AS r_click",
    "CAST(n_purchased AS DOUBLE) / CAST(n_viewed AS DOUBLE) AS r_purchase",
)


def _tf_sql() -> str:
    return f"""
    WITH v AS (
        SELECT user_id, MIN(epoch_us(ts)) AS v_us
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_us
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND epoch_us(e.ts) >= v.v_us
          AND epoch_us(e.ts) <= v.v_us + {_TF_CLICK_US}
        GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(e.ts) >= c.c_us
          AND epoch_us(e.ts) <= c.c_us + {_TF_BUY_US}
        GROUP BY 1
    )
    SELECT n_viewed, n_clicked, n_purchased,
           {_TF_RATES[0]}, {_TF_RATES[1]}
    FROM (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_viewed,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_clicked,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchased)
    """


@query(
    "timed_funnel_conversion",
    sql=_tf_sql(),
    tags=("analytics", "funnel", "temporal"),
)
def timed_funnel_conversion(spark, sf_dir):
    """Deadline-constrained funnel: first view per user, first click
    within 1 HOUR of it, first purchase within 24 HOURS of that click —
    the timed variant of funnel_view_click_purchase (the untimed funnel
    credits conversions that took a week, which inflates every
    stage-rate it reports).

    Exactness: all comparisons run on integer epoch-microseconds
    (Spark unix_micros / DuckDB epoch_us — engine-specific spelling,
    identical integer values); stage counts are exact; the two rates
    are shared double divisions.

    Scale shape: three keyed aggregations co-partitioned on user_id
    (each stage joins the previous stage's per-user anchor, then
    min-reduces); no window over the raw stream, no cross join — at
    100 TB the stream shuffles at most once per stage on the same key.
    """
    ev = read_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(us).alias("v_us"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .select("user_id", us.alias("e_us"))
        .join(v, "user_id")
        .where(
            (F.col("e_us") >= F.col("v_us"))
            & (F.col("e_us") <= F.col("v_us") + _TF_CLICK_US)
        )
        .groupBy("user_id")
        .agg(F.min("e_us").alias("c_us"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", us.alias("e_us"))
        .join(c, "user_id")
        .where(
            (F.col("e_us") >= F.col("c_us"))
            & (F.col("e_us") <= F.col("c_us") + _TF_BUY_US)
        )
        .groupBy("user_id")
        .agg(F.min("e_us").alias("p_us"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).cast("long").alias("n_viewed"))
        .crossJoin(
            c.agg(F.count(F.lit(1)).cast("long").alias("n_clicked"))
        )
        .crossJoin(
            p.agg(F.count(F.lit(1)).cast("long").alias("n_purchased"))
        )
    )
    return counts.selectExpr(
        "n_viewed", "n_clicked", "n_purchased", _TF_RATES[0], _TF_RATES[1]
    )
