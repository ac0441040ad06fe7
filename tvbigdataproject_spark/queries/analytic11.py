"""Round-9 batch 11: distribution-shape and graph-mixing analytics.

- dist_moments_by_segment  exact central skewness / excess kurtosis of
                           order value per customer segment — the
                           distribution-shape card a feed monitor pins
                           next to mean/stddev
- avg_neighbor_degree      knn(k): average neighbor degree as a
                           function of node degree on the trade graph —
                           the degree-mixing CURVE behind the single
                           assortativity number

Cross-engine exactness: moments center on the INTEGER floor-mean mu0 =
S div n, so every power sum is an exact integer (Sum d^2 in int64,
Sum d^3 / Sum d^4 in 128-bit with the wide split-cast); the fractional
mean remainder delta = r/n re-enters through the standard shift
formulas as a handful of IEEE ops on agreed doubles, spelled
identically in both engines. knn(k) is pure integer sums + one
division.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries._stable import (
    dec_to_double_wide,
    sql_huge_to_double,
    sql_huge_to_double_wide,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# Moment corrections about the true mean mu = mu0 + delta, from power
# sums of d = x - mu0 (delta = r/n in [0,1)):
#   M2 = Sd2/n - delta^2
#   M3 = Sd3/n - 3*delta*(Sd2/n) + 2*delta^3
#   M4 = Sd4/n - 4*delta*(Sd3/n) + 6*delta^2*(Sd2/n) - 3*delta^4
# spelled ONCE here and reused verbatim in both engines below.
_MOM_TAIL = """
           d2 / nd - delta * delta AS m2,
           (d3 / nd - 3.0 * delta * (d2 / nd)) + 2.0 * delta * delta * delta
               AS m3,
           ((d4 / nd - 4.0 * delta * (d3 / nd))
            + 6.0 * (delta * delta) * (d2 / nd))
               - 3.0 * (delta * delta) * (delta * delta) AS m4
"""


@query(
    "dist_moments_by_segment",
    sql=f"""
    WITH o AS (
        SELECT c.c_mktsegment AS segment,
               CAST(ROUND(o.o_totalprice) AS BIGINT) AS x
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    seg AS (
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s
        FROM o GROUP BY 1
    ),
    mu AS (SELECT segment, n, s, s // n AS mu0, s % n AS r FROM seg),
    d AS (
        SELECT o.segment, mu.n, mu.r, o.x - mu.mu0 AS d
        FROM o JOIN mu ON o.segment = mu.segment
    ),
    pw AS (
        SELECT segment, MAX(n) AS n, MAX(r) AS r,
               CAST(SUM(d * d) AS BIGINT) AS sd2,
               SUM(CAST(d * d AS HUGEINT) * d) AS sd3,
               SUM(CAST(d * d AS HUGEINT) * (d * d)) AS sd4
        FROM d GROUP BY segment
    ),
    dbl AS (
        SELECT segment, n, r, sd2,
               CAST(n AS DOUBLE) AS nd,
               CAST(r AS DOUBLE) / CAST(n AS DOUBLE) AS delta,
               CAST(sd2 AS DOUBLE) AS d2,
               {sql_huge_to_double_wide('sd3')} AS d3,
               {sql_huge_to_double_wide('sd4')} AS d4
        FROM pw
    ),
    mom AS (
        SELECT segment, n, r, sd2, d3 AS sd3_d, d4 AS sd4_d,
               {_MOM_TAIL}
        FROM dbl
    )
    SELECT segment, n, r, sd2, sd3_d, sd4_d, m2,
           m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)) AS skewness,
           m4 / (m2 * m2) - 3.0 AS kurtosis_excess
    FROM mom
    """,
    tags=("analytics", "stats", "distribution"),
)
def dist_moments_by_segment(spark, sf_dir):
    """Skewness and excess kurtosis of order value per customer
    segment — the two shape numbers that catch what mean/variance
    monitoring can't (a heavy right tail forming, or a distribution
    going bimodal-flat), per mixture slice.

    Exactness: rows center on the INTEGER floor-mean mu0 = S div n
    (never a rational mean), so d = x - mu0 is an exact integer and
    the power sums are exact (d^2 in int64; d^3/d^4 in 128-bit,
    surfaced through the wide split-cast twins). The fractional
    remainder delta = r/n re-enters via the standard moment-shift
    identities — the same double expression text in both engines.
    Dollars (not cents) keep Sum d^4 < ~6e30 at sf100, inside the wide
    cast's 2^117 bound.

    Scale shape: one join + per-segment aggregate for (S, n), a
    broadcast-sized rejoin of the 5-row mu table onto the fact rows,
    then one map-side-combined power-sum aggregate. Two corpus passes
    total — the price of an exact integer centering.
    """
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    o = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("o_totalprice")).cast("long").alias("x"),
    )
    seg = o.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").cast("long").alias("s")
    )
    mu = seg.select(
        "segment",
        "n",
        F.expr("s div n").alias("mu0"),
        F.expr("s % n").alias("r"),
    )
    d = o.join(F.broadcast(mu), "segment").select(
        "segment", "n", "r", (F.col("x") - F.col("mu0")).alias("d")
    )
    d2 = F.col("d") * F.col("d")
    pw = d.groupBy("segment").agg(
        F.max("n").alias("n"),
        F.max("r").alias("r"),
        F.sum(d2).cast("long").alias("sd2"),
        F.sum(d2.cast("decimal(38,0)") * F.col("d")).alias("sd3"),
        F.sum(d2.cast("decimal(38,0)") * d2).alias("sd4"),
    )
    dbl = pw.select(
        "segment",
        "n",
        "r",
        "sd2",
        F.col("n").cast("double").alias("nd"),
        (F.col("r").cast("double") / F.col("n").cast("double")).alias(
            "delta"
        ),
        F.col("sd2").cast("double").alias("d2"),
        dec_to_double_wide(F.col("sd3")).alias("d3"),
        dec_to_double_wide(F.col("sd4")).alias("d4"),
    )
    mom = dbl.selectExpr(
        "segment",
        "n",
        "r",
        "sd2",
        "d3 AS sd3_d",
        "d4 AS sd4_d",
        *[
            e.strip() + " AS " + a
            for e, a in zip(
                [
                    "d2 / nd - delta * delta",
                    "(d3 / nd - 3.0 * delta * (d2 / nd))"
                    " + 2.0 * delta * delta * delta",
                    "((d4 / nd - 4.0 * delta * (d3 / nd))"
                    " + 6.0 * (delta * delta) * (d2 / nd))"
                    " - 3.0 * (delta * delta) * (delta * delta)",
                ],
                ["m2", "m3", "m4"],
            )
        ],
    )
    return mom.selectExpr(
        "segment",
        "n",
        "r",
        "sd2",
        "sd3_d",
        "sd4_d",
        "m2",
        "m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)) AS skewness",
        "m4 / (m2 * m2) - 3.0 AS kurtosis_excess",
    )


@query(
    "avg_neighbor_degree",
    sql="""
    WITH e0 AS (
        SELECT o_custkey AS src, -l_suppkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    bi AS (
        SELECT src, dst FROM e0
        UNION ALL
        SELECT dst, src FROM e0
    ),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS k FROM bi GROUP BY 1),
    j AS (
        SELECT du.k AS k, dv.k AS knbr
        FROM bi
        JOIN deg du ON bi.src = du.node
        JOIN deg dv ON bi.dst = dv.node
    )
    SELECT k,
           CAST(COUNT(*) AS BIGINT) AS n_endpoints,
           CAST(SUM(knbr) AS BIGINT) AS sum_nbr_deg,
           CAST(SUM(knbr) AS DOUBLE) / COUNT(*) AS avg_nbr_deg
    FROM j GROUP BY k
    """,
    tags=("graph", "analytics", "assortativity"),
)
def avg_neighbor_degree(spark, sf_dir):
    """knn(k): average degree of the neighbors of degree-k nodes on
    the bidirectional customer↔supplier trade graph — the degree-mixing
    CURVE (Pastor-Satorras et al.): degree_assortativity_trade
    compresses mixing to one signed number; a falling knn(k) curve
    shows WHERE the disassortativity lives (hubs attaching to leaves).

    Exactness: degrees and endpoint counts are exact integers; the
    average is one double division per degree class.

    Scale shape: distinct-edge aggregate, one degree aggregate, then
    two shuffle equi-joins of the edge list against the degree table
    (linear, no broadcast of a per-node table) and a final aggregate
    keyed by the bounded degree domain.
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    e0 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (-F.col("l_suppkey")).alias("dst"),
        )
        .agg(F.lit(1).alias("_one"))
        .select("src", "dst")
    )
    bi = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = bi.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    du = deg.select(F.col("node").alias("src"), F.col("k").alias("k"))
    dv = deg.select(F.col("node").alias("dst"), F.col("k").alias("knbr"))
    j = bi.join(du, "src").join(dv, "dst")
    return j.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_endpoints"),
        F.sum("knbr").cast("long").alias("sum_nbr_deg"),
        (F.sum("knbr").cast("double") / F.count(F.lit(1))).alias(
            "avg_nbr_deg"
        ),
    )


# L-moment numerators are hockey-stick binomial sums over the sorted
# sample: b_r = (1/n) * Sum_{i} [C(i-1,r)/C(n-1,r)] x_(i). A tie run of
# value v occupying 0-based positions [s, s+c) contributes v * S_r with
# the closed forms S_1 = c*s + c(c-1)/2, S_2 = C3(s+c) - C3(s),
# S_3 = C4(s+c) - C4(s) (hockey-stick identity), so the whole
# computation runs on the DISTINCT-value table — no per-row ranks.
W = sql_huge_to_double_wide  # noqa: N816 — SQL-side wide split-cast

_LM_L1 = "b0"
_LM_L2 = "2.0 * b1 - b0"
_LM_L3 = "6.0 * b2 - 6.0 * b1 + b0"
_LM_L4 = "20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0"


@query(
    "l_moments_order_value",
    sql=f"""
    WITH v AS (
        SELECT CAST(ROUND(o_totalprice) AS BIGINT) AS x FROM orders
    ),
    mv AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY x),
    r AS (
        SELECT x, c,
               CAST(COALESCE(SUM(c) OVER (
                   ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS s
        FROM mv
    ),
    acc AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               SUM(CAST(x AS HUGEINT) * c) AS bb0,
               SUM(CAST(x AS HUGEINT)
                   * (c * s + c * (c - 1) // 2)) AS bb1,
               SUM(CAST(x AS HUGEINT)
                   * (CAST(s + c AS HUGEINT) * (s + c - 1) * (s + c - 2) // 6
                      - CAST(s AS HUGEINT) * (s - 1) * (s - 2) // 6)) AS bb2,
               SUM(CAST(x AS HUGEINT)
                   * (CAST(s + c AS HUGEINT) * (s + c - 1) * (s + c - 2)
                          * (s + c - 3) // 24
                      - CAST(s AS HUGEINT) * (s - 1) * (s - 2) * (s - 3)
                          // 24)) AS bb3
        FROM r
    ),
    b AS (
        SELECT n,
               {W('bb0')} / CAST(n AS DOUBLE) AS b0,
               {W('bb1')}
                   / {W('CAST(n AS HUGEINT) * (n - 1)')} AS b1,
               {W('bb2')}
                   / {W('CAST(n AS HUGEINT) * ((n - 1) * CAST(n - 2 AS HUGEINT) // 2)')}
                   AS b2,
               {W('bb3')}
                   / {W('CAST(n AS HUGEINT) * ((n - 1) * CAST(n - 2 AS HUGEINT) * (n - 3) // 6)')}
                   AS b3
        FROM acc
    )
    SELECT n, b0, b1, b2, b3,
           {_LM_L1} AS l1,
           {_LM_L2} AS l2,
           ({_LM_L3}) / ({_LM_L2}) AS t3,
           ({_LM_L4}) / ({_LM_L2}) AS t4,
           ({_LM_L2}) / ({_LM_L1}) AS l_cv
    FROM b
    """,
    tags=("analytics", "stats", "robust"),
)
def l_moments_order_value(spark, sf_dir):
    """First four L-moments of order value (whole dollars): L-scale,
    L-skewness t3, L-kurtosis t4, L-CV — the order-statistics shape
    summary hydrologists standardized (Hosking 1990) because unlike
    dist_moments_by_segment's cubed/fourthed deviations it is defined
    for heavy tails and barely moved by single outliers; the natural
    robust twin to the conventional-moment card.

    Exactness: b_r numerators collapse tie runs with exact hockey-stick
    integer closed forms on the DISTINCT-value table (S_2 = C(s+c,3) -
    C(s,3) etc. — products of consecutive integers, so the integer
    divisions are exact); sums run in 128-bit and surface through the
    wide split-cast twins. Bound: the b3 numerator is <= C(n-1,3) *
    Sum(x) ~ 1.3e32 at sf1 — inside the wide cast's 2^117; past ~sf3
    demote x to tens of dollars (documented, the spearman-bound
    pattern).

    Scale shape: one scan to the distinct-dollar table (bounded by the
    PRICE DOMAIN, not the row count), a cumulative window over that
    bounded grid (allowlisted — the ks_doclen_lang convention), one
    one-row accumulator.
    """
    from pyspark.sql import Window as W

    orders = read_table(spark, sf_dir, "orders")
    v = orders.select(F.round("o_totalprice").cast("long").alias("x"))
    mv = v.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = W.orderBy("x").rowsBetween(W.unboundedPreceding, -1)
    r = mv.select(
        "x",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).cast("long").alias("s"),
    )
    d38 = lambda e: F.expr(e).cast("decimal(38,0)")  # noqa: E731
    comb3 = (
        lambda lead: (d38(lead) * F.expr(f"{lead} - 1") * F.expr(f"{lead} - 2"))
        / 6
    )  # noqa: E731
    comb4 = (
        lambda lead: (
            d38(lead)
            * F.expr(f"{lead} - 1")
            * F.expr(f"{lead} - 2")
            * F.expr(f"{lead} - 3")
        )
        / 24
    )  # noqa: E731
    to_i = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    acc = r.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(d38("x") * F.col("c")).alias("bb0"),
        F.sum(
            d38("x")
            * (
                F.col("c") * F.col("s")
                + F.expr("c * (c - 1) div 2")
            )
        ).alias("bb1"),
        F.sum(
            d38("x") * (to_i(comb3("(s + c)")) - to_i(comb3("s")))
        ).alias("bb2"),
        F.sum(
            d38("x") * (to_i(comb4("(s + c)")) - to_i(comb4("s")))
        ).alias("bb3"),
    )
    den1 = d38("n") * F.expr("n - 1")
    den2 = d38("n") * to_i((d38("(n - 1)") * F.expr("n - 2")) / 2)
    den3 = d38("n") * to_i(
        (d38("(n - 1)") * F.expr("n - 2") * F.expr("n - 3")) / 6
    )
    wde = dec_to_double_wide
    b = acc.select(
        "n",
        (wde(F.col("bb0")) / F.col("n").cast("double")).alias("b0"),
        (wde(F.col("bb1")) / wde(den1)).alias("b1"),
        (wde(F.col("bb2")) / wde(den2)).alias("b2"),
        (wde(F.col("bb3")) / wde(den3)).alias("b3"),
    )
    return b.selectExpr(
        "n",
        "b0",
        "b1",
        "b2",
        "b3",
        f"{_LM_L1} AS l1",
        f"{_LM_L2} AS l2",
        f"({_LM_L3}) / ({_LM_L2}) AS t3",
        f"({_LM_L4}) / ({_LM_L2}) AS t4",
        f"({_LM_L2}) / ({_LM_L1}) AS l_cv",
    )


_XC_A = "view"
_XC_B = "purchase"
_XC_MAX_LAG = 3

_XC_CORR = (
    "CASE WHEN np >= 2 AND np * sxx - sx * sx > 0"
    "          AND np * syy - sy * sy > 0 "
    "THEN (CAST(np AS DOUBLE) * {SXY} - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) "
    "/ (sqrt(CAST(np AS DOUBLE) * {SXX} - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) "
    "* sqrt(CAST(np AS DOUBLE) * {SYY} - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) "
    "ELSE NULL END"
)


def _xcorr_sql() -> str:
    corr = _XC_CORR.format(
        SXY=sql_huge_to_double("sxy"),
        SXX=sql_huge_to_double("sxx"),
        SYY=sql_huge_to_double("syy"),
    )
    return f"""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type IN ('{_XC_A}', '{_XC_B}')
        GROUP BY 1, 2
    ),
    a AS (SELECT x, cents FROM daily WHERE event_type = '{_XC_A}'),
    b AS (SELECT x, cents FROM daily WHERE event_type = '{_XC_B}'),
    lags AS (
        SELECT UNNEST(range(-{_XC_MAX_LAG}, {_XC_MAX_LAG + 1})) AS lag
    ),
    j AS (
        SELECT l.lag, a.cents AS xa, b.cents AS xb
        FROM lags l
        JOIN a ON TRUE
        JOIN b ON b.x = a.x + l.lag
    ),
    m AS (
        SELECT lag,
               CAST(COUNT(*) AS BIGINT) AS np,
               CAST(SUM(xa) AS BIGINT) AS sx,
               CAST(SUM(xb) AS BIGINT) AS sy,
               SUM(CAST(xa AS HUGEINT) * xb) AS sxy,
               SUM(CAST(xa AS HUGEINT) * xa) AS sxx,
               SUM(CAST(xb AS HUGEINT) * xb) AS syy
        FROM j GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag, np, sx, sy,
           {corr} AS xcorr
    FROM m
    """


@query(
    "xcorr_lead_lag_types",
    sql=_xcorr_sql(),
    tags=("analytics", "stats", "timeseries"),
)
def xcorr_lead_lag_types(spark, sf_dir):
    """Lead-lag cross-correlation between daily '{_XC_A}' and
    '{_XC_B}' revenue at lags -{_XC_MAX_LAG}..{_XC_MAX_LAG}: corr(
    {_XC_A}_t, {_XC_B}_(t+lag)) — acf_daily_revenue's two-series
    sibling, the standard question "does one stream LEAD the other,
    and by how many days?" (the argmax lag is the conversion delay a
    funnel report guesses at).

    Exactness: daily cents are exact; all six moments per lag are
    exact integers (second moments in 128-bit, surfaced via the narrow
    split-cast); the Pearson expression and its degenerate guard are
    identical text in both engines.

    Scale shape: one filtered scan to two per-day series (bounded by
    calendar span), a 7-row lag spine crossed with the day grid, and
    an equi-join on the shifted day index. Everything after the first
    aggregate is calendar-bounded.
    """
    ev = read_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(_XC_A, _XC_B)
    )
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.to_date("ts"), F.lit("2024-01-01").cast("date")
        ).alias("x"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    a = daily.where(F.col("event_type") == _XC_A).select("x", "cents")
    b = daily.where(F.col("event_type") == _XC_B).select(
        F.col("x").alias("xb"), F.col("cents").alias("bcents")
    )
    lags = ev.sparkSession.range(
        -_XC_MAX_LAG, _XC_MAX_LAG + 1
    ).select(F.col("id").cast("long").alias("lag"))
    j = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("xb") == F.col("x") + F.col("lag"))
        .select("lag", F.col("cents").alias("xa"), F.col("bcents").alias("xb2"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("xa").cast("long").alias("sx"),
        F.sum("xb2").cast("long").alias("sy"),
        F.sum(dec("xa") * F.col("xb2")).alias("sxy"),
        F.sum(dec("xa") * F.col("xa")).alias("sxx"),
        F.sum(dec("xb2") * F.col("xb2")).alias("syy"),
    )
    corr_expr = _XC_CORR.format(
        SXY="CAST(sxy AS DOUBLE)",
        SXX="CAST(sxx AS DOUBLE)",
        SYY="CAST(syy AS DOUBLE)",
    )
    return m.selectExpr(
        "CAST(lag AS INT) AS lag",
        "np",
        "sx",
        "sy",
        f"{corr_expr} AS xcorr",
    )


@query(
    "transition_dwell_quartiles",
    sql="""
    WITH seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER w AS to_type,
               (epoch_us(LEAD(ts) OVER w) - epoch_us(ts))
                   // 60000000 AS gap_min
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
        SELECT from_type, to_type, CAST(gap_min AS BIGINT) AS gap
        FROM seq WHERE to_type IS NOT NULL
    ),
    counts AS (
        SELECT from_type, to_type, gap, COUNT(*) AS cnt
        FROM g GROUP BY 1, 2, 3
    ),
    cum AS (
        SELECT from_type, to_type, gap, cnt,
               CAST(SUM(cnt) OVER (
                   PARTITION BY from_type, to_type ORDER BY gap
               ) AS BIGINT) AS cum,
               CAST(SUM(cnt) OVER (
                   PARTITION BY from_type, to_type
               ) AS BIGINT) AS n
        FROM counts
    )
    SELECT from_type, to_type, MAX(n) AS n_transitions,
           MIN(CASE WHEN cum >= (n + 3) // 4 THEN gap END) AS q1_min,
           MIN(CASE WHEN cum >= (n + 1) // 2 THEN gap END) AS median_min,
           MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN gap END) AS q3_min
    FROM cum GROUP BY from_type, to_type
    """,
    tags=("analytics", "temporal", "sequence"),
)
def transition_dwell_quartiles(spark, sf_dir):
    """Dwell-time quartiles per event-type transition: for every
    (from_type, to_type) pair, exact type-1 quartiles of the
    whole-minute gap between consecutive events of one user —
    event_transitions says WHERE users go next, this says HOW LONG
    they sit before going (the timing half of a funnel/session model;
    a long view->purchase median is a deliberation step, a zero
    error->error median is a retry loop).

    Exactness: gaps are exact integer minutes (epoch-microsecond
    difference, integer division); quartiles are type-1 row picks on
    the (pair, gap) count table — the interarrival_quartiles
    machinery, keyed one level finer.

    Scale shape: the lag window partitions by user (the natural key);
    the quantile windows partition by the bounded type-pair set over
    the MINUTE-gap count table, whose size is bounded by pairs x
    minute domain (calendar-bounded), never by corpus rows.
    """
    from pyspark.sql import Window as W

    ev = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
        # unix_micros rejects TIMESTAMP_NTZ; the session is pinned UTC,
        # so the LTZ cast carries identical instants
        F.expr(
            "(unix_micros(CAST(lead(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP))"
            " - unix_micros(CAST(ts AS TIMESTAMP))) div 60000000"
        ).alias("gap"),
    ).where(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type", "gap").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wp = W.partitionBy("from_type", "to_type").orderBy("gap")
    cum = counts.select(
        "from_type",
        "to_type",
        "gap",
        F.sum("cnt").over(wp).cast("long").alias("cum"),
        F.sum("cnt")
        .over(W.partitionBy("from_type", "to_type"))
        .cast("long")
        .alias("n"),
    )
    pick = lambda c: F.min(  # noqa: E731
        F.when(F.col("cum") >= c, F.col("gap"))
    )
    return cum.groupBy("from_type", "to_type").agg(
        F.max("n").alias("n_transitions"),
        pick(F.expr("(n + 3) div 4")).alias("q1_min"),
        pick(F.expr("(n + 1) div 2")).alias("median_min"),
        pick(F.expr("(3 * n + 3) div 4")).alias("q3_min"),
    )


@query(
    "weighted_median_price_by_brand",
    sql="""
    WITH sold AS (
        SELECT p.p_brand AS brand,
               CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS price_c,
               CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS w
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT brand, price_c, w,
               CAST(SUM(w) OVER (
                   PARTITION BY brand ORDER BY price_c
               ) AS BIGINT) AS cw,
               CAST(SUM(w) OVER (PARTITION BY brand) AS BIGINT) AS tw
        FROM sold
    )
    SELECT brand, MAX(tw) AS total_qty,
           MIN(CASE WHEN 2 * cw >= tw THEN price_c END) AS wmedian_price_c,
           MIN(CASE WHEN 4 * cw >= tw THEN price_c END) AS wq1_price_c,
           MIN(CASE WHEN 4 * cw >= 3 * tw THEN price_c END) AS wq3_price_c
    FROM cum GROUP BY brand
    """,
    tags=("analytics", "stats", "quantiles"),
)
def weighted_median_price_by_brand(spark, sf_dir):
    """QUANTITY-weighted median (and quartiles) of part retail price
    per brand — "the price of the median unit SOLD", which moves with
    volume mix while the unweighted median of the catalog stays put;
    the weighted-quantile primitive (sample weights, importance
    weights, row multiplicities) the plain quantile tier doesn't cover.

    Exactness: weights are exact integer quantities; the picks are
    type-1 weighted quantiles — smallest price whose cumulative weight
    reaches the target fraction, spelled as integer cross-products
    (2*cw >= tw), no division anywhere.

    Scale shape: one join + (brand, price) aggregate with map-side
    partials; the cumulative windows partition by brand over the
    bounded (brand x distinct-retail-price) table — the price DOMAIN
    caps the window input at any scale factor.
    """
    from pyspark.sql import Window as W

    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    sold = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.round(F.col("p_retailprice") * 100)
            .cast("long")
            .alias("price_c"),
        )
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long"))
            .cast("long")
            .alias("w")
        )
    )
    wcum = W.partitionBy("brand").orderBy("price_c")
    cum = sold.select(
        "brand",
        "price_c",
        F.sum("w").over(wcum).cast("long").alias("cw"),
        F.sum("w").over(W.partitionBy("brand")).cast("long").alias("tw"),
    )
    pick = lambda cond: F.min(F.when(cond, F.col("price_c")))  # noqa: E731
    return cum.groupBy("brand").agg(
        F.max("tw").alias("total_qty"),
        pick(2 * F.col("cw") >= F.col("tw")).alias("wmedian_price_c"),
        pick(4 * F.col("cw") >= F.col("tw")).alias("wq1_price_c"),
        pick(4 * F.col("cw") >= 3 * F.col("tw")).alias("wq3_price_c"),
    )
