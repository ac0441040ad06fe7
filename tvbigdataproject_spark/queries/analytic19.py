"""Analytics batch 19 (r12): dependence, long-memory, and population
estimation —

- ljung_box_daily        portmanteau white-noise test on daily revenue
                         (Q = n(n+2) sum r_k^2/(n-k), lags 1..7) — the
                         statistic that says whether acf/pacf's wiggles
                         are structure or noise
- cvm_doclen_lang        two-sample Cramér-von Mises distance between
                         language doc-length distributions — the
                         whole-CDF companion of ks_doclen_lang (KS sees
                         the worst point; CvM integrates every gap, so
                         it catches broad mild drift KS under-weights)
- entropy_rate_markov    entropy rate H = -sum_i pi_i sum_j p_ij ln p_ij
                         of the event-type Markov chain — bits-per-step
                         unpredictability of user behavior, marrying
                         markov_stationary_types (pi) with the MLE
                         transition matrix
- capture_recapture_users  Lincoln-Petersen / Chapman estimate of the
                         active-user population from two week-apart
                         activity samples, with the TRUE count alongside
                         (the estimator audits itself on closed data)
- hurst_rs_daily         rescaled-range (R/S) Hurst exponent of daily
                         revenue over block sizes 16/32/64/128 — the
                         long-memory diagnostic (H=0.5 random walk,
                         H>0.5 persistent trends)
- tail_dependence_nations  upper-tail dependence of two nations' daily
                         revenue: P(X > q95(X) | Y > q95(Y)) — do
                         extremes co-occur (the risk question plain
                         correlation can't answer)

Exactness: counts/cumulative counts/cross-multiplied CDF gaps are
exact integers (KS discipline); logs ride the portable plog kernel;
per-term doubles are rounded once and stable-summed where an
accumulation crosses partitions.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tvbigdataproject_spark.functions.portable import (
    apply_stages,
    plog_stages,
    sql_wrap_stages,
)
from tvbigdataproject_spark.queries._stable import (
    dec_to_double_wide,
    sql_huge_to_double_wide,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# ------------------------------------------------------------- Q395

_LB_LAGS = 7
_LB_SCALE = 10**12

_LB_DAILY = """
    daily AS (
        SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS s FROM daily),
    dev AS (
        SELECT d.x, CAST(t.n AS BIGINT) * d.y - t.s AS e
        FROM daily d CROSS JOIN tot t
    ),
    den AS (
        SELECT CAST(SUM(CAST(e AS DECIMAL(38,0)) * CAST(e AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS den
        FROM dev
    )
"""


def _lb_sql() -> str:
    # each lag's contribution r_k^2/(n-k) is rounded ONCE at 1e12 and
    # the 7 terms sum as exact BIGINTs (order-free)
    contrib = (
        f"CAST(ROUND(({sql_huge_to_double_wide('num')}"
        f" / {sql_huge_to_double_wide('den')})"
        f" * ({sql_huge_to_double_wide('num')}"
        f" / {sql_huge_to_double_wide('den')})"
        f" / CAST(n - k AS DOUBLE) * {_LB_SCALE}) AS BIGINT)"
    )
    return f"""
    WITH {_LB_DAILY},
    lags AS (SELECT UNNEST(range(1, {_LB_LAGS + 1})) AS k),
    num AS (
        SELECT l.k,
               CAST(SUM(CAST(a.e AS DECIMAL(38,0)) * CAST(b.e AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS num
        FROM lags l
        JOIN dev a ON TRUE
        JOIN dev b ON b.x = a.x + l.k
        GROUP BY l.k
    ),
    terms AS (
        SELECT {contrib} AS c
        FROM num CROSS JOIN den CROSS JOIN tot
    )
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS sum_scaled,
           CAST(t.n AS DOUBLE) * CAST(t.n + 2 AS DOUBLE)
               * (CAST(SUM(c) AS DOUBLE) / {_LB_SCALE}) AS q_ljung_box
    FROM terms CROSS JOIN tot t
    GROUP BY t.n
    """


@query(
    "ljung_box_daily",
    sql=_lb_sql(),
    tags=("analytics", "stats", "timeseries"),
)
def ljung_box_daily(spark, sf_dir):
    """Ljung-Box portmanteau statistic on daily revenue, lags 1..{L}:
    Q = n(n+2) sum r_k^2/(n-k) — the joint white-noise test behind
    every ARMA fit: acf/pacf locate structure lag-by-lag, Q says
    whether the first {L} lags TOGETHER reject noise (chi-square with
    {L} dof under H0; at TPC-H's strong weekly cycle Q is enormous,
    which is the point — the pipeline's seasonality detectors are
    fed by real autocorrelation, not sampling wiggle).

    Exactness: r_k ride acf_daily_revenue's exact decimal machinery;
    each lag's r_k^2/(n-k) is one shared-text double rounded ONCE at
    1e12, and the {L} contributions sum as exact BIGINTs — no float
    accumulation order anywhere.

    Scale shape: one orders scan to the day grid; lag joins and the
    7-row total are grid-bounded.
    """
    orders = read_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "y"
            )
        )
        .select(
            F.datediff("day", F.lit("1992-01-01").cast("date")).alias("x"),
            "y",
        )
    )
    tot = daily.agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("s"))
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "x", (F.col("n").cast("long") * F.col("y") - F.col("s")).alias("e")
    )
    ed = F.col("e").cast("decimal(38,0)")
    den = dev.agg(F.sum(ed * ed).cast("decimal(38,0)").alias("den"))
    lags = F.broadcast(
        spark.range(1, _LB_LAGS + 1).select(
            F.col("id").cast("long").alias("k")
        )
    )
    a = dev.crossJoin(lags).select(
        "k", (F.col("x") + F.col("k")).alias("xk"), F.col("e").alias("ea")
    )
    b = dev.select(F.col("x").alias("xk"), F.col("e").alias("eb"))
    num = (
        a.join(b, "xk")
        .groupBy("k")
        .agg(
            F.sum(
                F.col("ea").cast("decimal(38,0)")
                * F.col("eb").cast("decimal(38,0)")
            )
            .cast("decimal(38,0)")
            .alias("num")
        )
    )
    rk = dec_to_double_wide(F.col("num")) / dec_to_double_wide(F.col("den"))
    terms = (
        num.crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(tot.select("n")))
        .select(
            F.round(
                rk * rk / (F.col("n") - F.col("k")).cast("double")
                * _LB_SCALE
            )
            .cast("long")
            .alias("c"),
            F.col("n"),
        )
    )
    return terms.groupBy("n").agg(
        F.sum("c").cast("long").alias("sum_scaled"),
        (
            F.col("n").cast("double")
            * (F.col("n") + 2).cast("double")
            * (F.sum("c").cast("double") / _LB_SCALE)
        ).alias("q_ljung_box"),
    ).select(F.col("n").cast("long").alias("n"), "sum_scaled", "q_ljung_box")


ljung_box_daily.__doc__ = ljung_box_daily.__doc__.format(L=_LB_LAGS)


# ------------------------------------------------------------- Q396


@query(
    "cvm_doclen_lang",
    sql=f"""
    WITH a AS (
        SELECT n_chars AS v, COUNT(*) AS ca FROM documents
        WHERE lang = 'en' GROUP BY 1
    ),
    b AS (
        SELECT n_chars AS v, COUNT(*) AS cb FROM documents
        WHERE lang = 'zh' GROUP BY 1
    ),
    grid AS (
        SELECT v, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
        FROM a FULL OUTER JOIN b USING (v)
    ),
    cum AS (
        SELECT v, ca, cb,
               CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
               CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cumb
        FROM grid
    ),
    t AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
        FROM grid
    ),
    s AS (
        SELECT CAST(SUM(CAST(ca + cb AS DECIMAL(38,0))
                    * (CAST(cuma AS DECIMAL(38,0)) * t.nb
                       - CAST(cumb AS DECIMAL(38,0)) * t.na)
                    * (CAST(cuma AS DECIMAL(38,0)) * t.nb
                       - CAST(cumb AS DECIMAL(38,0)) * t.na))
                    AS DECIMAL(38,0)) AS s2
        FROM cum CROSS JOIN t
    )
    SELECT t.na, t.nb, {sql_huge_to_double_wide('s.s2')} AS gap2_sum,
           {sql_huge_to_double_wide('s.s2')}
               / CAST(t.na AS DOUBLE) / CAST(t.nb AS DOUBLE)
               / CAST(t.na + t.nb AS DOUBLE) / CAST(t.na + t.nb AS DOUBLE)
               AS cvm_t
    FROM s CROSS JOIN t
    """,
    tags=("analytics", "stats", "distribution-test"),
)
def cvm_doclen_lang(spark, sf_dir):
    """Two-sample Cramér-von Mises statistic between the en and zh
    document-length distributions: T = (n1*n2/N^2) * sum over pooled
    observations of (F1 - F2)^2 — the whole-CDF drift test beside
    ks_doclen_lang: KS alarms on the single worst CDF gap, CvM
    integrates EVERY gap, so a broad mild shift that never produces
    one big gap still scores (the corpus-drift case that matters for
    mixture monitoring).

    Exactness: every CDF gap is the exact cross-multiplied integer
    cuma*nb - cumb*na (the KS discipline); each pooled point's
    squared gap times its multiplicity sums in DECIMAL(38,0); T is
    one wide-cast and three shared-text divisions.

    Scale shape: identical to KS — two filtered aggregates onto the
    bounded length-value grid, one cumulative window over that grid,
    one decimal total.
    """
    docs = read_table(spark, sf_dir, "documents")
    a = (
        docs.where(F.col("lang") == "en")
        .groupBy(F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    b = (
        docs.where(F.col("lang") == "zh")
        .groupBy(F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    grid = a.join(b, "v", "full_outer").select(
        "v",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select(
        "ca",
        "cb",
        F.sum("ca").over(w).cast("long").alias("cuma"),
        F.sum("cb").over(w).cast("long").alias("cumb"),
    )
    t = grid.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    gap = (
        F.col("cuma").cast("decimal(38,0)") * F.col("nb")
        - F.col("cumb").cast("decimal(38,0)") * F.col("na")
    )
    s = (
        cum.crossJoin(F.broadcast(t))
        .select(
            ((F.col("ca") + F.col("cb")).cast("decimal(38,0)") * gap * gap)
            .alias("g"),
            "na",
            "nb",
        )
        .groupBy("na", "nb")
        .agg(F.sum("g").cast("decimal(38,0)").alias("s2"))
    )
    g2 = dec_to_double_wide(F.col("s2"))
    return s.select(
        "na",
        "nb",
        g2.alias("gap2_sum"),
        (
            g2
            / F.col("na").cast("double")
            / F.col("nb").cast("double")
            / (F.col("na") + F.col("nb")).cast("double")
            / (F.col("na") + F.col("nb")).cast("double")
        ).alias("cvm_t"),
    )


# ------------------------------------------------------------- Q397

# ride markov_stationary_types' exact scaled power iteration
from tvbigdataproject_spark.queries.analytic13 import (  # noqa: E402
    _MK_ROUNDS,
    _MK_S_P,
    _MK_S_PI,
)

_ER_SCALE = 10**12


def _er_sql() -> str:
    pairs = """
    SELECT cur, nxt FROM (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS nxt
        FROM events
    ) WHERE nxt IS NOT NULL
    """
    trans = f"SELECT cur, nxt, COUNT(*) AS c FROM ({pairs}) GROUP BY 1, 2"
    rowt = f"SELECT cur, CAST(SUM(c) AS BIGINT) AS r FROM ({trans}) GROUP BY 1"
    ps = f"""
    SELECT t.cur, t.nxt,
           (CAST(t.c AS BIGINT) * {_MK_S_P}) // w.r AS ps
    FROM ({trans}) t JOIN ({rowt}) w ON t.cur = w.cur
    """
    cur = f"""
    (SELECT cur AS t,
            CAST({_MK_S_PI} AS BIGINT)
                // (SELECT COUNT(*) FROM ({rowt})) AS pis
     FROM ({rowt}))
    """
    for _ in range(_MK_ROUNDS):
        cur = f"""
        (SELECT s.nxt AS t,
                CAST(SUM((p.pis * s.ps) // {_MK_S_P}) AS BIGINT) AS pis
         FROM {cur} p JOIN ({ps}) s ON p.t = s.cur
         GROUP BY 1)
        """
    cell = f"""
    SELECT pi.pis, t.c, w.r
    FROM ({trans}) t
    JOIN ({rowt}) w ON t.cur = w.cur
    JOIN {cur} pi ON pi.t = t.cur
    """
    cell = sql_wrap_stages(cell, plog_stages("r", "_lr", "_e1_"))
    cell = sql_wrap_stages(cell, plog_stages("c", "_lc", "_e2_"))
    term = (
        f"CAST(ROUND((CAST(pis AS DOUBLE) / {_MK_S_PI})"
        " * (CAST(c AS DOUBLE) / CAST(r AS DOUBLE))"
        f" * (_lr - _lc) * {_ER_SCALE}) AS BIGINT)"
    )
    return f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM({term}) AS BIGINT) AS h_scaled,
           CAST(SUM({term}) AS DOUBLE) / {_ER_SCALE} AS entropy_rate_nats
    FROM {cell}
    """


@query(
    "entropy_rate_markov",
    sql=_er_sql(),
    tags=("analytics", "events", "markov", "infotheory"),
)
def entropy_rate_markov(spark, sf_dir):
    """Entropy rate of the event-type Markov chain: H = -sum_i pi_i
    sum_j p_ij ln p_ij (nats per step), pi from the same 3-round
    scaled-integer power iteration markov_stationary_types pins and
    p_ij from the MLE transition matrix — the per-step
    unpredictability of user behavior under its long-run mix
    (transition_entropy_events conditions on the CURRENT state;
    entropy rate weights states by where users actually spend time).

    Exactness: pi rides the exact 1e12-scaled iteration; each cell's
    ln p = ln c - ln r comes from two portable-kernel logs on INTEGER
    counts; the per-cell term is rounded once at 1e12 and the bounded
    #types^2 cell table sums as exact BIGINTs.

    Scale shape: one windowed pair extraction (the markov tier's
    shuffle); everything after runs on the #types x #types matrix.
    """
    ev = read_table(spark, sf_dir, "events")
    pairs = ev.selectExpr(
        "event_type AS cur",
        "LEAD(event_type) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id) AS nxt",
    ).where(F.col("nxt").isNotNull())
    trans = pairs.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    rowt = trans.groupBy("cur").agg(F.sum("c").cast("long").alias("r"))
    ps = trans.join(rowt, "cur").selectExpr(
        "cur", "nxt", f"(CAST(c AS BIGINT) * {_MK_S_P}) div r AS ps"
    )
    k = rowt.agg(F.count(F.lit(1)).alias("k"))
    pi = (
        rowt.select(F.col("cur").alias("t"))
        .crossJoin(F.broadcast(k))
        .selectExpr("t", f"CAST({_MK_S_PI} AS BIGINT) div k AS pis")
    )
    for _ in range(_MK_ROUNDS):
        pi = (
            pi.join(ps, pi.t == ps.cur)
            .groupBy(F.col("nxt").alias("t2"))
            .agg(
                F.sum(
                    F.expr(f"(pis * ps) div {_MK_S_P}")
                ).cast("long").alias("pis")
            )
            .select(F.col("t2").alias("t"), "pis")
        )
    cell = (
        trans.join(rowt, "cur")
        .join(pi, trans.cur == pi.t)
        .select("pis", "c", "r")
    )
    cell = apply_stages(cell, plog_stages("r", "_lr", "_e1_"))
    cell = apply_stages(cell, plog_stages("c", "_lc", "_e2_"))
    term = F.expr(
        f"CAST(ROUND((CAST(pis AS DOUBLE) / {_MK_S_PI})"
        " * (CAST(c AS DOUBLE) / CAST(r AS DOUBLE))"
        f" * (_lr - _lc) * {_ER_SCALE}) AS BIGINT)"
    )
    return cell.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum(term).cast("long").alias("h_scaled"),
        (F.sum(term).cast("double") / _ER_SCALE).alias(
            "entropy_rate_nats"
        ),
    )


# ------------------------------------------------------------- Q398


@query(
    "capture_recapture_users",
    sql="""
    WITH bounds AS (
        SELECT CAST(MIN(CAST(ts AS DATE)) AS DATE) AS d0 FROM events
    ),
    s1 AS (
        SELECT DISTINCT user_id FROM events CROSS JOIN bounds
        WHERE CAST(ts AS DATE) BETWEEN d0 AND d0 + INTERVAL 6 DAY
    ),
    s2 AS (
        SELECT DISTINCT user_id FROM events CROSS JOIN bounds
        WHERE CAST(ts AS DATE) BETWEEN d0 + INTERVAL 7 DAY
                                   AND d0 + INTERVAL 13 DAY
    ),
    m AS (
        SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n1,
               CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n2,
               CAST((SELECT COUNT(*) FROM s1 JOIN s2 USING (user_id))
                    AS BIGINT) AS overlap,
               CAST((SELECT COUNT(DISTINCT user_id) FROM events)
                    AS BIGINT) AS true_users
    )
    SELECT n1, n2, overlap, true_users,
           CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / CAST(overlap + 1 AS DOUBLE)
               - CAST(1 AS DOUBLE) AS chapman_estimate
    FROM m
    """,
    tags=("analytics", "sampling", "estimation"),
)
def capture_recapture_users(spark, sf_dir):
    """Chapman capture-recapture estimate of the active-user
    population from two week-apart activity samples (week 1 = capture,
    week 2 = recapture; the overlap is the "marked" recapture count):
    N_hat = (n1+1)(n2+1)/(m+1) - 1 — the ecology estimator product
    analytics reuses to size a population only partially observed in
    any window. The TRUE distinct-user count rides alongside, so the
    row is a built-in calibration: on closed populations (no
    arrival/churn) Chapman lands near truth; the gap measures churn.

    Exactness: all four counts are exact BIGINTs over deterministic
    calendar windows anchored at the corpus's min event date; the
    estimate is one shared-text double expression.

    Scale shape: two filtered distinct aggregates + one semi-join on
    user_id (all partial-aggregated keyed shuffles), one full
    distinct count — nothing beyond the dedup tier's standard ops.
    """
    ev = read_table(spark, sf_dir, "events")
    d0 = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0")
    )
    base = ev.select("user_id", F.col("ts").cast("date").alias("d")).crossJoin(
        F.broadcast(d0)
    )
    s1 = (
        base.where(
            (F.col("d") >= F.col("d0"))
            & (F.col("d") <= F.date_add("d0", 6))
        )
        .select("user_id")
        .distinct()
    )
    s2 = (
        base.where(
            (F.col("d") >= F.date_add("d0", 7))
            & (F.col("d") <= F.date_add("d0", 13))
        )
        .select("user_id")
        .distinct()
    )
    n1 = s1.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    n2 = s2.agg(F.count(F.lit(1)).cast("long").alias("n2"))
    ov = (
        s1.join(s2, "user_id", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
    )
    tr = ev.agg(
        F.countDistinct("user_id").cast("long").alias("true_users")
    )
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(ov))
        .crossJoin(F.broadcast(tr))
        .selectExpr(
            "n1",
            "n2",
            "overlap",
            "true_users",
            "CAST((n1 + 1) * (n2 + 1) AS DOUBLE)"
            " / CAST(overlap + 1 AS DOUBLE) - CAST(1 AS DOUBLE)"
            " AS chapman_estimate",
        )
    )


# ------------------------------------------------------------- Q399

_HURST_SIZES = (16, 32, 64, 128)
_HURST_SCALE = 10**6


def _hurst_block_sql(m: int) -> str:
    """Average R/S over complete blocks of size m (1-row subquery)."""
    return f"""
    (WITH idx AS (
        SELECT ROW_NUMBER() OVER (ORDER BY x) - 1 AS i, y
        FROM daily
    ),
    blk AS (
        SELECT i // {m} AS b, i % {m} AS j, y FROM idx
    ),
    stats AS (
        SELECT b, COUNT(*) AS cnt, CAST(SUM(y) AS BIGINT) AS s,
               CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS ss
        FROM blk GROUP BY 1
    ),
    cum AS (
        SELECT blk.b,
               CAST(SUM(CAST({m} AS BIGINT) * blk.y - st.s)
                    OVER (PARTITION BY blk.b ORDER BY blk.j)
                    AS DECIMAL(38,0)) AS cd
        FROM blk JOIN stats st ON st.b = blk.b AND st.cnt = {m}
    ),
    rng AS (
        SELECT b, CAST(MAX(cd) - MIN(cd) AS DECIMAL(38,0)) AS rsc
        FROM cum GROUP BY 1
    ),
    rs AS (
        SELECT CAST(ROUND({sql_huge_to_double_wide('rng.rsc')}
               / sqrt({sql_huge_to_double_wide(
                   f'(CAST({m} AS DECIMAL(38,0)) * st.ss - CAST(st.s AS DECIMAL(38,0)) * st.s)'
               )}) * {_HURST_SCALE}) AS BIGINT) AS v
        FROM rng JOIN stats st ON st.b = rng.b AND st.cnt = {m}
    )
    SELECT CAST(SUM(v) AS DOUBLE) / COUNT(*) / {_HURST_SCALE} FROM rs)
    """


def _hurst_sql() -> str:
    cols = ", ".join(
        f"{_hurst_block_sql(m)} AS rs{m}" for m in _HURST_SIZES
    )
    body = f"""
    WITH daily AS (
        SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY 1
    )
    SELECT {cols}
    """
    lo, hi = _HURST_SIZES[0], _HURST_SIZES[-1]
    body = sql_wrap_stages(f"({body})", plog_stages(f"rs{lo}", "_llo", "_h1_"))
    body = sql_wrap_stages(body, plog_stages(f"rs{hi}", "_lhi", "_h2_"))
    body = sql_wrap_stages(body, plog_stages(str(lo), "_lmlo", "_h3_"))
    body = sql_wrap_stages(body, plog_stages(str(hi), "_lmhi", "_h4_"))
    rss = ", ".join(f"rs{m}" for m in _HURST_SIZES)
    return f"""
    SELECT {rss},
           (_lhi - _llo) / (_lmhi - _lmlo) AS hurst
    FROM {body}
    """


@query(
    "hurst_rs_daily",
    sql=_hurst_sql(),
    tags=("analytics", "stats", "timeseries"),
)
def hurst_rs_daily(spark, sf_dir):
    """Hurst exponent of daily revenue by rescaled-range analysis:
    average R/S over complete blocks of m = {sizes} consecutive
    observations, H = slope of ln(R/S) between the end scales — the
    long-memory diagnostic (H = 0.5 memoryless, H > 0.5 persistent:
    shocks echo for weeks, which changes how far any forecast tier
    can see). Declared estimator: endpoint-slope over the {lo}..{hi}
    scale ladder, complete blocks only, population-SD normalization.

    Exactness: per-block deviations are m-scaled exact integers
    (m*y - S), cumulative deviations and ranges exact DECIMAL(38,0);
    each block's R/S divides two wide-cast exacts (IEEE sqrt) and is
    rounded ONCE at 1e6 into a stable BIGINT mean; the two logs ride
    the portable kernel; the slope is one shared-text division.

    Scale shape: one orders scan to the calendar-bounded day grid;
    4 block ladders of windows over <=2500 rows each.
    """
    orders = read_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "y"
            )
        )
        .select(
            F.datediff("day", F.lit("1992-01-01").cast("date")).alias("x"),
            "y",
        )
    )
    # NOTE (r12, measured): an eager checkpoint of the day grid was
    # tried and made the query SLOWER (8.0s -> 15.0s at sf0.01) — the
    # cost here is Catalyst compile time over the four portable-log
    # CASE-ladder stacks, not the 4 re-derived orders scans (the scan
    # is bounded-aggregate cheap), and checkpointing only added two
    # blocking materialization jobs per call. Lazy is the right shape.
    idx = daily.select(
        (F.row_number().over(Window.orderBy("x")) - 1).alias("i"), "y"
    )
    out = None
    for m in _HURST_SIZES:
        blk = idx.select(
            (F.col("i") / m).cast("long").alias("b"),
            (F.col("i") % m).alias("j"),
            "y",
        )
        stats = blk.groupBy("b").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("y").cast("long").alias("s"),
            F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
            .cast("decimal(38,0)")
            .alias("ss"),
        )
        wb = (
            Window.partitionBy("b")
            .orderBy("j")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = (
            blk.join(
                stats.where(F.col("cnt") == m), "b"
            )
            .select(
                "b",
                "j",
                "s",
                "ss",
                F.sum(F.lit(m).cast("long") * F.col("y") - F.col("s"))
                .over(wb)
                .cast("decimal(38,0)")
                .alias("cd"),
            )
        )
        rng = cum.groupBy("b", "s", "ss").agg(
            (F.max("cd") - F.min("cd")).cast("decimal(38,0)").alias("rsc")
        )
        q = (
            F.lit(m).cast("decimal(38,0)") * F.col("ss")
            - F.col("s").cast("decimal(38,0)") * F.col("s")
        ).cast("decimal(38,0)")
        rs = rng.select(
            F.round(
                dec_to_double_wide(F.col("rsc"))
                / F.sqrt(dec_to_double_wide(q))
                * _HURST_SCALE
            )
            .cast("long")
            .alias("v")
        )
        leg = rs.agg(
            (
                F.sum("v").cast("double")
                / F.count(F.lit(1))
                / _HURST_SCALE
            ).alias(f"rs{m}")
        )
        out = leg if out is None else out.crossJoin(F.broadcast(leg))
    lo, hi = _HURST_SIZES[0], _HURST_SIZES[-1]
    out = apply_stages(out, plog_stages(f"rs{lo}", "_llo", "_h1_"))
    out = apply_stages(out, plog_stages(f"rs{hi}", "_lhi", "_h2_"))
    out = apply_stages(out, plog_stages(str(lo), "_lmlo", "_h3_"))
    out = apply_stages(out, plog_stages(str(hi), "_lmhi", "_h4_"))
    rss = [f"rs{m}" for m in _HURST_SIZES]
    return out.selectExpr(
        *rss, "(_lhi - _llo) / (_lmhi - _lmlo) AS hurst"
    )


hurst_rs_daily.__doc__ = hurst_rs_daily.__doc__.format(
    sizes=_HURST_SIZES, lo=_HURST_SIZES[0], hi=_HURST_SIZES[-1]
)


# ------------------------------------------------------------- Q400

_TD_Q = 0.95
_TD_NATIONS = ("NATION_2", "NATION_7")  # synthetic dims: NATION_0..24


def _td_leg_sql(nat: str, alias: str) -> str:
    return f"""
    {alias} AS (
        SELECT date_diff('day', DATE '1992-01-01',
                         CAST(o.o_orderdate AS DATE)) AS x,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS y
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE n.n_name = '{nat}'
        GROUP BY 1
    )
    """


@query(
    "tail_dependence_nations",
    sql=f"""
    WITH {_td_leg_sql(_TD_NATIONS[0], "xa")},
    {_td_leg_sql(_TD_NATIONS[1], "xb")},
    paired AS (
        SELECT xa.x, xa.y AS ya, xb.y AS yb
        FROM xa JOIN xb USING (x)
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM paired),
    qa AS (
        SELECT y AS q FROM (
            SELECT ya AS y, ROW_NUMBER() OVER (ORDER BY ya) AS rk
            FROM paired
        ) CROSS JOIN n WHERE rk = CAST(CEIL({_TD_Q} * n) AS BIGINT)
    ),
    qb AS (
        SELECT y AS q FROM (
            SELECT yb AS y, ROW_NUMBER() OVER (ORDER BY yb) AS rk
            FROM paired
        ) CROSS JOIN n WHERE rk = CAST(CEIL({_TD_Q} * n) AS BIGINT)
    )
    SELECT n.n AS n_days,
           CAST(SUM(CASE WHEN p.yb > qb.q THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b_extreme,
           CAST(SUM(CASE WHEN p.ya > qa.q AND p.yb > qb.q THEN 1 ELSE 0 END)
               AS BIGINT) AS n_joint_extreme,
           CASE WHEN SUM(CASE WHEN p.yb > qb.q THEN 1 ELSE 0 END) = 0
                THEN CAST(0 AS DOUBLE)
                ELSE CAST(SUM(CASE WHEN p.ya > qa.q AND p.yb > qb.q
                              THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(SUM(CASE WHEN p.yb > qb.q THEN 1 ELSE 0 END)
                            AS DOUBLE)
           END AS lambda_upper
    FROM paired p CROSS JOIN qa CROSS JOIN qb CROSS JOIN n
    GROUP BY n.n
    """,
    tags=("analytics", "stats", "dependence"),
)
def tail_dependence_nations(spark, sf_dir):
    """Empirical upper-tail dependence between {a} and {b} daily
    revenue: lambda_U = P(X_a > q95(X_a) | X_b > q95(X_b)) over
    calendar-paired days — do the two markets spike TOGETHER, the
    extremal-dependence question correlation cannot answer (two
    series can correlate 0.9 yet have independent extremes, and vice
    versa; portfolio/capacity risk lives in the joint tail).

    Exactness: q95 is the exact order statistic (row_number =
    ceil(0.95 n) over the bounded paired-day grid — percentile_disc
    semantics, no interpolation); all exceedance counts are exact
    integers; lambda is one shared-text division.

    Scale shape: two broadcast-dim filtered aggregates onto the day
    grid, one day-keyed equi-join, two bounded rank windows, one
    grid-bounded conditional aggregate.
    """
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nat = read_table(spark, sf_dir, "nation")

    def leg(name):
        return (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
            .where(F.col("n_name") == name)
            .groupBy(F.col("o_orderdate").cast("date").alias("day"))
            .agg(
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).alias("y")
            )
            .select(
                F.datediff(
                    "day", F.lit("1992-01-01").cast("date")
                ).alias("x"),
                "y",
            )
        )

    xa = leg(_TD_NATIONS[0]).select("x", F.col("y").alias("ya"))
    xb = leg(_TD_NATIONS[1]).select("x", F.col("y").alias("yb"))
    paired = xa.join(xb, "x")
    n = paired.agg(F.count(F.lit(1)).cast("long").alias("n"))

    def q_of(col):
        ranked = paired.select(
            F.col(col).alias("y"),
            F.row_number().over(Window.orderBy(col)).alias("rk"),
        ).crossJoin(F.broadcast(n))
        return ranked.where(
            F.col("rk") == F.ceil(_TD_Q * F.col("n")).cast("long")
        ).select(F.col("y").alias("q"))

    qa = q_of("ya").select(F.col("q").alias("q_a"))
    qb = q_of("yb").select(F.col("q").alias("q_b"))
    return (
        paired.crossJoin(F.broadcast(qa))
        .crossJoin(F.broadcast(qb))
        .crossJoin(F.broadcast(n))
        .groupBy(F.col("n").alias("n_days"))
        .agg(
            F.sum(F.when(F.col("yb") > F.col("q_b"), 1).otherwise(0))
            .cast("long")
            .alias("n_b_extreme"),
            F.sum(
                F.when(
                    (F.col("ya") > F.col("q_a"))
                    & (F.col("yb") > F.col("q_b")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_joint_extreme"),
        )
        .select(
            "n_days",
            "n_b_extreme",
            "n_joint_extreme",
            # zero-guard: at tiny SFs the paired grid can have no
            # conditioning exceedances (ceil(.95n) = n) — lambda is 0
            # by convention, and ANSI mode would otherwise throw
            F.when(F.col("n_b_extreme") == 0, F.lit(0.0))
            .otherwise(
                F.col("n_joint_extreme").cast("double")
                / F.col("n_b_extreme").cast("double")
            )
            .alias("lambda_upper"),
        )
    )


tail_dependence_nations.__doc__ = tail_dependence_nations.__doc__.format(
    a=_TD_NATIONS[0], b=_TD_NATIONS[1]
)
