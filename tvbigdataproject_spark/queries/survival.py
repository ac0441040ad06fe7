"""Survival analysis on the repurchase design: the time-to-event tier.

- km_na_survival_weekly      Kaplan-Meier survival curve + Nelson-Aalen
                             cumulative hazard for weeks-to-second-order
                             (right-censored at end of data) — the
                             retention curve repurchase_survival's
                             fixed-horizon rates only sample at two
                             points
- logrank_repurchase_segments  the logrank test between two customer
                             segments' repurchase curves, with the
                             chi-square(1) p-value via 2(1 - Phi(sqrt x))

Survival estimators are PRODUCTS over event times — transcendental-free
on paper but order-sensitive as float products. The portable kernel
turns the product into an exact-integer ln-cumsum:
ln S(t) = sum_{s<=t} [plog(n_s - d_s) - plog(n_s)] accumulated as
scaled BIGINTs over the bounded week grid, then S = pexp(.) — every
intermediate bitwise-equal across engines.

Design shared with repurchase_survival (analytic9.py): first/second
order per customer via per-customer rank windows; censoring time =
weeks from first order to the global max order date.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.portable import (
    apply_stages,
    pexp_stages,
    plog_stages,
    pnorm_stages,
    sql_wrap_stages,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_S = 1_000_000_000
_LN_ZERO = -50  # sentinel ln(0): e^-50 ~ 2e-22 renders S(t) = 0

# pexp's 2^k ladder saturates past |src| ~ 62; accumulated _LN_ZERO
# sentinels (one per fully-depleted week) can push ln_s below that,
# where the tail polynomial is evaluated out of range. Clamp at -60
# (e^-60 ~ 8.8e-27, still "survival = 0" to any reader) with a CASE
# shared verbatim by both engines, keeping s_km in [0, 1] always.
_LN_S_CLAMPED = (
    "CASE WHEN ln_s < CAST(-60 AS DOUBLE)"
    " THEN CAST(-60 AS DOUBLE) ELSE ln_s END"
)

# shared: per-customer (segment, time_weeks, event) with right censoring
_SURV_BASE = """
    SELECT c.c_mktsegment AS segment,
           CASE WHEN g.second_od IS NULL
                THEN (g.max_od - g.first_od) // 7
                ELSE (g.second_od - g.first_od) // 7 END AS t,
           CASE WHEN g.second_od IS NULL THEN 0 ELSE 1 END AS ev
    FROM (
        SELECT r.o_custkey,
               MAX(CASE WHEN r.rn = 1 THEN r.od END) AS first_od,
               MAX(CASE WHEN r.rn = 2 THEN r.od END) AS second_od,
               MAX(m.mx) AS max_od
        FROM (
            SELECT o_custkey, od,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey ORDER BY od, o_orderkey
                   ) AS rn
            FROM (SELECT o_custkey, o_orderkey,
                         CAST(o_orderdate AS DATE) AS od FROM orders)
        ) r
        CROSS JOIN (SELECT MAX(CAST(o_orderdate AS DATE)) AS mx
                    FROM orders) m
        WHERE r.rn <= 2
        GROUP BY r.o_custkey
    ) g
    JOIN customer c ON g.o_custkey = c.c_custkey
"""


def _km_sql() -> str:
    weeks = f"""
    SELECT t, CAST(SUM(ev) AS BIGINT) AS d, COUNT(*) AS c
    FROM ({_SURV_BASE}) GROUP BY t
    """
    grid = f"""
    SELECT t, d, c,
           CAST(SUM(c) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk
    FROM ({weeks})
    """
    ev = f"SELECT t, d, n_risk FROM ({grid}) WHERE d > 0"
    ev = sql_wrap_stages(f"({ev})", plog_stages("n_risk", "_ln", "_s1_"))
    ev = sql_wrap_stages(
        f"""(SELECT *, CASE WHEN n_risk > d THEN CAST(1 AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS ok FROM {ev})""",
        plog_stages(
            "CASE WHEN n_risk > d THEN n_risk - d ELSE 1 END",
            "_lnd",
            "_s2_",
        ),
    )
    term = (
        f"CASE WHEN ok = 1 THEN CAST(ROUND((_lnd - _ln) * {_S}) AS BIGINT)"
        f" ELSE CAST({_LN_ZERO} AS BIGINT) * {_S} END"
    )
    hterm = (
        "CAST(ROUND(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)"
        f" * {_S}) AS BIGINT)"
    )
    cum = f"""
    SELECT t, d, n_risk,
           CAST(SUM({term}) OVER (ORDER BY t) AS DOUBLE)
               / CAST({_S} AS DOUBLE) AS ln_s,
           CAST(SUM({hterm}) OVER (ORDER BY t) AS DOUBLE)
               / CAST({_S} AS DOUBLE) AS h_na
    FROM {ev}
    """
    out = sql_wrap_stages(
        f"({cum})", pexp_stages(_LN_S_CLAMPED, "s_km", "_s3_")
    )
    return f"SELECT t AS week, d, n_risk, s_km, h_na FROM {out}"


@query(
    "km_na_survival_weekly",
    sql=_km_sql(),
    tags=("analytics", "survival", "infotheory"),
)
def km_na_survival_weekly(spark, sf_dir):
    """Kaplan-Meier survival and Nelson-Aalen cumulative hazard of
    weeks-to-second-order, right-censored at the end of data — the
    full retention curve (repurchase_survival reads it at two fixed
    horizons; this is the whole estimator, one row per event week).

    Exactness: at-risk counts come from a DESCENDING cumulative over
    the bounded week grid (exact integers); ln S(t) accumulates
    portable-ln terms plog(n-d) - plog(n) as scaled BIGINTs (an
    all-events week contributes the documented ln(0) sentinel -50,
    rendering S = 0); S = pexp(ln S); the hazard accumulates d/n the
    same way. Every output double is bitwise-equal across engines.

    Scale shape: per-customer rank windows (customer-partitioned),
    one week-grid aggregate; the cumulative windows run over the
    calendar-bounded grid (allowlisted class).
    """
    from pyspark.sql import Window as W

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    od = orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("od"),
    )
    # the global max date is a 1-row AGGREGATE broadcast onto the
    # ranked rows (a MAX() OVER () window would single-task the corpus)
    ranked = od.select(
        "o_custkey",
        "od",
        F.row_number()
        .over(W.partitionBy("o_custkey").orderBy("od", "o_orderkey"))
        .alias("rn"),
    ).where(F.col("rn") <= 2)
    mx = od.agg(F.max("od").alias("mx"))
    g = ranked.crossJoin(F.broadcast(mx)).groupBy("o_custkey").agg(
        F.max(F.when(F.col("rn") == 1, F.col("od"))).alias("first_od"),
        F.max(F.when(F.col("rn") == 2, F.col("od"))).alias("second_od"),
        F.max("mx").alias("max_od"),
    )
    base = g.join(
        cust, g.o_custkey == cust.c_custkey
    ).selectExpr(
        "c_mktsegment AS segment",
        "CASE WHEN second_od IS NULL"
        " THEN datediff(max_od, first_od) div 7"
        " ELSE datediff(second_od, first_od) div 7 END AS t",
        "CASE WHEN second_od IS NULL THEN 0 ELSE 1 END AS ev",
    )
    weeks = base.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d"),
        F.count(F.lit(1)).alias("c"),
    )
    grid = weeks.select(
        "t",
        "d",
        F.sum("c")
        .over(W.orderBy(F.desc("t")))
        .cast("long")
        .alias("n_risk"),
    )
    ev = grid.where(F.col("d") > 0)
    ev = apply_stages(ev, plog_stages("n_risk", "_ln", "_s1_"))
    ev = ev.selectExpr(
        "*",
        "CASE WHEN n_risk > d THEN CAST(1 AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END AS ok",
    )
    ev = apply_stages(
        ev,
        plog_stages(
            "CASE WHEN n_risk > d THEN n_risk - d ELSE 1 END",
            "_lnd",
            "_s2_",
        ),
    )
    term = (
        f"CASE WHEN ok = 1 THEN CAST(ROUND((_lnd - _ln) * {_S}) AS BIGINT)"
        f" ELSE CAST({_LN_ZERO} AS BIGINT) * {_S} END"
    )
    hterm = (
        "CAST(ROUND(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)"
        f" * {_S}) AS BIGINT)"
    )
    wt = W.orderBy("t")
    cum = ev.select(
        "t",
        "d",
        "n_risk",
        (
            F.sum(F.expr(term)).over(wt).cast("double")
            / F.lit(_S).cast("double")
        ).alias("ln_s"),
        (
            F.sum(F.expr(hterm)).over(wt).cast("double")
            / F.lit(_S).cast("double")
        ).alias("h_na"),
    )
    out = apply_stages(cum, pexp_stages(_LN_S_CLAMPED, "s_km", "_s3_"))
    return out.selectExpr("t AS week", "d", "n_risk", "s_km", "h_na")


# ---------------------------------------------------------------- Q36

_LR_A = "BUILDING"
_LR_B = "MACHINERY"

# logrank per event week: O1 - E1 = d1 - d * n1/n;
# V = d (n1/n)(n2/n)(n - d)/(n - 1)
_LR_OE = (
    "CAST(d1 AS DOUBLE) - CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE)"
    " / CAST(n AS DOUBLE)"
)
_LR_V = (
    "CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))"
    " * (CAST(n2 AS DOUBLE) / CAST(n AS DOUBLE))"
    " * (CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE))"
)


def _lr_sql() -> str:
    two = f"""
    SELECT segment, t, ev FROM ({_SURV_BASE})
    WHERE segment IN ('{_LR_A}', '{_LR_B}')
    """
    weeks = f"""
    SELECT t,
           CAST(SUM(CASE WHEN segment = '{_LR_A}' THEN ev ELSE 0 END)
                AS BIGINT) AS d1,
           CAST(SUM(ev) AS BIGINT) AS d,
           CAST(SUM(CASE WHEN segment = '{_LR_A}' THEN 1 ELSE 0 END)
                AS BIGINT) AS c1,
           COUNT(*) AS c
    FROM ({two}) GROUP BY t
    """
    grid = f"""
    SELECT t, d1, d,
           CAST(SUM(c1) OVER (ORDER BY t DESC) AS BIGINT) AS n1,
           CAST(SUM(c) OVER (ORDER BY t DESC) AS BIGINT) AS n
    FROM ({weeks})
    """
    ev = f"""
    SELECT t, d1, d, n1, n - n1 AS n2, n FROM ({grid})
    WHERE d > 0 AND n > 1
    """
    agg = f"""
    SELECT CAST(SUM(CAST(ROUND(({_LR_OE}) * {_S}) AS BIGINT)) AS DOUBLE)
               / CAST({_S} AS DOUBLE) AS oe,
           CAST(SUM(CAST(ROUND(({_LR_V}) * {_S}) AS BIGINT)) AS DOUBLE)
               / CAST({_S} AS DOUBLE) AS v
    FROM ({ev})
    """
    chi = f"SELECT oe, v, (oe * oe) / v AS chi2 FROM ({agg})"
    body = sql_wrap_stages(
        f"({chi})", pnorm_stages("CAST(0 AS DOUBLE) - sqrt(chi2)", "_phi", "_lr_")
    )
    return f"""
    SELECT oe, v, chi2, CAST(2 AS DOUBLE) * _phi AS p_value FROM {body}
    """


@query(
    "logrank_repurchase_segments",
    sql=_lr_sql(),
    tags=("analytics", "survival", "inference"),
)
def logrank_repurchase_segments(spark, sf_dir):
    """Logrank test between the BUILDING and MACHINERY segments'
    repurchase survival curves: chi2 = (sum(O1 - E1))^2 / sum(V) over
    event weeks, with the EXACT chi-square(1) identity
    p = 2 (1 - Phi(sqrt chi2)) through the portable normal CDF — the
    standard "did retention differ" readout on censored data (a mean
    or rate comparison throws away the censoring).

    Exactness: per-week O-E and V terms are identically-spelled IEEE
    ratios of exact integer counts, accumulated as scaled BIGINTs over
    the bounded week grid; sqrt and the portable Phi pin the p-value
    bitwise.

    Scale shape: the survival base's customer-partitioned rank
    windows, a week-grid aggregate, and descending cumulatives over
    the calendar-bounded grid (allowlisted class).
    """
    from pyspark.sql import Window as W

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    od = orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("od"),
    )
    # the global max date is a 1-row AGGREGATE broadcast onto the
    # ranked rows (a MAX() OVER () window would single-task the corpus)
    ranked = od.select(
        "o_custkey",
        "od",
        F.row_number()
        .over(W.partitionBy("o_custkey").orderBy("od", "o_orderkey"))
        .alias("rn"),
    ).where(F.col("rn") <= 2)
    mx = od.agg(F.max("od").alias("mx"))
    g = ranked.crossJoin(F.broadcast(mx)).groupBy("o_custkey").agg(
        F.max(F.when(F.col("rn") == 1, F.col("od"))).alias("first_od"),
        F.max(F.when(F.col("rn") == 2, F.col("od"))).alias("second_od"),
        F.max("mx").alias("max_od"),
    )
    base = g.join(cust, g.o_custkey == cust.c_custkey).selectExpr(
        "c_mktsegment AS segment",
        "CASE WHEN second_od IS NULL"
        " THEN datediff(max_od, first_od) div 7"
        " ELSE datediff(second_od, first_od) div 7 END AS t",
        "CASE WHEN second_od IS NULL THEN 0 ELSE 1 END AS ev",
    ).where(F.col("segment").isin(_LR_A, _LR_B))
    weeks = base.groupBy("t").agg(
        F.sum(F.when(F.col("segment") == _LR_A, F.col("ev")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum("ev").cast("long").alias("d"),
        F.sum(F.when(F.col("segment") == _LR_A, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.count(F.lit(1)).alias("c"),
    )
    grid = weeks.select(
        "t",
        "d1",
        "d",
        F.sum("c1").over(W.orderBy(F.desc("t"))).cast("long").alias("n1"),
        F.sum("c").over(W.orderBy(F.desc("t"))).cast("long").alias("n"),
    )
    ev = grid.selectExpr(
        "t", "d1", "d", "n1", "n - n1 AS n2", "n"
    ).where((F.col("d") > 0) & (F.col("n") > 1))
    agg = ev.agg(
        F.expr(
            f"CAST(SUM(CAST(ROUND(({_LR_OE}) * {_S}) AS BIGINT))"
            f" AS DOUBLE) / CAST({_S} AS DOUBLE)"
        ).alias("oe"),
        F.expr(
            f"CAST(SUM(CAST(ROUND(({_LR_V}) * {_S}) AS BIGINT))"
            f" AS DOUBLE) / CAST({_S} AS DOUBLE)"
        ).alias("v"),
    )
    chi = agg.selectExpr("oe", "v", "(oe * oe) / v AS chi2")
    out = apply_stages(
        chi,
        pnorm_stages("CAST(0 AS DOUBLE) - sqrt(chi2)", "_phi", "_lr_"),
    )
    return out.selectExpr(
        "oe", "v", "chi2", "CAST(2 AS DOUBLE) * _phi AS p_value"
    )
