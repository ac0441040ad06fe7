"""The resampling / uncertainty tier: distribution-free error bars at
scale, fully deterministic and oracle-replayable.

- poisson_bootstrap_ci     the Poisson bootstrap (the distributed
                           bootstrap: per-row Poisson(1) multiplicities
                           instead of n-out-of-n resampling, so no
                           global coordination) for the mean order
                           value, B = 39 resamples, type-6 2.5/97.5
                           percentile CI
- block_jackknife_ci       delete-one-block jackknife over 32 hash
                           blocks — the O(B) error bar that needs NO
                           data explosion (block sums suffice)
- poisson_rate_ztest       weekend-vs-weekday purchase-rate z-test
                           (two-sample Poisson rates) with the portable
                           normal p-value
- dispersion_index_by_type daily-count variance-to-mean ratio per event
                           type + the normal-approximation
                           overdispersion z — the Poisson-ness check
                           that decides whether rate alarms can use
                           sqrt(n) thresholds

Determinism: "randomness" is the portable md5 hash pushed through
fixed integer inverse-CDF thresholds; every resample weight is an
exact integer in both engines, so the bootstrap distribution — not
just its summary — is bitwise-reproducible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.portable import (
    apply_stages,
    pnorm_stages,
    sql_wrap_stages,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_S = 1_000_000_000
# squared CENTS deviations overflow int64 at the 1e9 scale; 1e6 keeps
# the jackknife variance sum exact with ~1e-6 relative grain
_S2 = 1_000_000

# ---------------------------------------------------------------- Q37

_B = 39  # (B+1) * 0.025 = 1: the 1st/39th order stats ARE the 2.5/97.5
# Poisson(1) inverse CDF over the 16-bit hash domain: P(W <= k) * 65536
_POIS_T = (24109, 48218, 60273, 64291, 65296, 65497, 65530, 65535)


def _pois_w(h: str) -> str:
    branches = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"CASE {branches} ELSE 8 END"


def _boot_sql() -> str:
    w = _pois_w("hb")
    return f"""
    WITH rows_b AS (
        SELECT b.i AS b,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
               ('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)
                                  || ':' || CAST(b.i AS VARCHAR)),
                               1, 4))::BIGINT AS hb
        FROM orders o CROSS JOIN range({_B}) b(i)
    ),
    per AS (
        SELECT b, CAST(SUM({w}) AS BIGINT) AS n_b,
               CAST(SUM(({w}) * cents) AS BIGINT) AS s_b
        FROM rows_b GROUP BY b
    ),
    means AS (
        SELECT b, CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS m,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE), b
               ) AS rk
        FROM per WHERE n_b > 0
    ),
    base AS (
        SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_c,
               COUNT(*) AS n
        FROM orders
    )
    SELECT base.n, base.mean_c,
           MIN(CASE WHEN rk = 1 THEN m END) AS ci_lo_c,
           MIN(CASE WHEN rk = {_B} THEN m END) AS ci_hi_c
    FROM means CROSS JOIN base
    GROUP BY base.n, base.mean_c
    """


@query(
    "poisson_bootstrap_ci",
    sql=_boot_sql(),
    tags=("analytics", "stats", "resampling"),
)
def poisson_bootstrap_ci(spark, sf_dir):
    """95% bootstrap CI for the mean order value (cents) by the
    POISSON bootstrap — each row enters resample b with multiplicity
    W ~ Poisson(1) drawn from md5(orderkey:b), which is how a
    bootstrap actually runs on a cluster (no n-out-of-n coordination,
    one pass, map-side weights). B = {b} resamples; the 1st/{b}th
    order statistics are the exact type-6 2.5/97.5 percentiles
    ((B+1) * 0.025 = 1).

    Exactness: weights are integer inverse-CDF lookups on the portable
    hash; every resample sum/count is an exact BIGINT; the B means are
    bitwise-equal doubles ranked over a {b}-row table.

    Scale shape: the corpus fans out x{b} (the documented cost of a
    bootstrap — still one linear pass, map-side combined to {b} rows);
    the ranking window sees {b} rows.
    """
    from pyspark.sql import Window as W

    orders = read_table(spark, sf_dir, "orders")
    from tvbigdataproject_spark.functions.hashing import hex16_hash
    from tvbigdataproject_spark.sources import scan_spread

    # project to the two needed columns, then restore row parallelism
    # BEFORE the x39 md5 fan-out: the single-row-group input makes the
    # scan one task, and the fan-out's 39 * |orders| hashes ran inside
    # it (measured r12: ~5 of this query's 6.4 s in that one task).
    # scan_spread is a no-op whenever the scan is already parallel.
    base = scan_spread(
        orders.select(
            F.col("o_orderkey").cast("string").alias("ok"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        ),
        "ok",
    )
    rows_b = base.crossJoin(
        spark.range(_B).select(F.col("id").alias("b"))
    ).select(
        "b",
        "cents",
        hex16_hash(
            F.concat_ws(":", F.col("ok"), F.col("b").cast("string"))
        ).alias("hb"),
    )
    w = _pois_w("hb")
    per = rows_b.groupBy("b").agg(
        F.expr(f"CAST(SUM({w}) AS BIGINT)").alias("n_b"),
        F.expr(f"CAST(SUM(({w}) * cents) AS BIGINT)").alias("s_b"),
    )
    means = (
        per.where(F.col("n_b") > 0)
        .selectExpr(
            "b", "CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS m"
        )
        .select(
            "b",
            "m",
            F.row_number().over(W.orderBy("m", "b")).alias("rk"),
        )
    )
    base = orders.agg(
        F.expr(
            "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
            " AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
        ).alias("mean_c"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        means.crossJoin(F.broadcast(base))
        .groupBy("n", "mean_c")
        .agg(
            F.min(F.when(F.col("rk") == 1, F.col("m"))).alias("ci_lo_c"),
            F.min(F.when(F.col("rk") == _B, F.col("m"))).alias("ci_hi_c"),
        )
    )


poisson_bootstrap_ci.__doc__ = poisson_bootstrap_ci.__doc__.format(b=_B)


# ---------------------------------------------------------------- Q38

_JK_B = 32


@query(
    "block_jackknife_ci",
    sql=f"""
    WITH blk AS (
        SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))
                   ::BIGINT % {_JK_B} AS blk,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    per AS (
        SELECT blk, COUNT(*) AS n_i, CAST(SUM(cents) AS BIGINT) AS s_i
        FROM blk GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(n_i) AS BIGINT) AS n,
               CAST(SUM(s_i) AS BIGINT) AS s,
               COUNT(*) AS nb
        FROM per
    ),
    theta AS (
        SELECT per.blk,
               CAST(tot.s - per.s_i AS DOUBLE)
                   / CAST(tot.n - per.n_i AS DOUBLE) AS th,
               tot.n, tot.s, tot.nb
        FROM per CROSS JOIN tot
    ),
    tbar AS (
        SELECT MAX(n) AS n, MAX(s) AS s, MAX(nb) AS nb,
               CAST(SUM(CAST(ROUND(th * {_S}) AS BIGINT)) AS DOUBLE)
                   / CAST({_S} AS DOUBLE) / CAST(MAX(nb) AS DOUBLE)
                   AS th_bar
        FROM theta
    )
    SELECT tbar.n,
           CAST(tbar.s AS DOUBLE) / CAST(tbar.n AS DOUBLE) AS mean_c,
           sqrt(CAST(tbar.nb - 1 AS DOUBLE) / CAST(tbar.nb AS DOUBLE)
                * (CAST(SUM(CAST(ROUND((theta.th - tbar.th_bar)
                                       * (theta.th - tbar.th_bar)
                                       * {_S2}) AS BIGINT)) AS DOUBLE)
                   / CAST({_S2} AS DOUBLE))) AS se_jack,
           CAST(tbar.s AS DOUBLE) / CAST(tbar.n AS DOUBLE)
               - CAST(1.959963985 AS DOUBLE)
                 * sqrt(CAST(tbar.nb - 1 AS DOUBLE)
                        / CAST(tbar.nb AS DOUBLE)
                        * (CAST(SUM(CAST(ROUND((theta.th - tbar.th_bar)
                                               * (theta.th - tbar.th_bar)
                                               * {_S2}) AS BIGINT))
                                AS DOUBLE) / CAST({_S2} AS DOUBLE)))
               AS ci_lo_c,
           CAST(tbar.s AS DOUBLE) / CAST(tbar.n AS DOUBLE)
               + CAST(1.959963985 AS DOUBLE)
                 * sqrt(CAST(tbar.nb - 1 AS DOUBLE)
                        / CAST(tbar.nb AS DOUBLE)
                        * (CAST(SUM(CAST(ROUND((theta.th - tbar.th_bar)
                                               * (theta.th - tbar.th_bar)
                                               * {_S2}) AS BIGINT))
                                AS DOUBLE) / CAST({_S2} AS DOUBLE)))
               AS ci_hi_c
    FROM theta CROSS JOIN tbar
    GROUP BY tbar.n, tbar.s, tbar.nb, tbar.th_bar
    """,
    tags=("analytics", "stats", "resampling"),
)
def block_jackknife_ci(spark, sf_dir):
    """Delete-one-block jackknife standard error + 95% normal CI for
    the mean order value over {b} md5 hash blocks — the error bar that
    costs ONE keyed aggregate (block sums are sufficient statistics;
    nothing fans out, unlike the bootstrap) and is the estimator of
    choice when the bootstrap's x B pass is too expensive.

    Exactness: leave-one-out means are divisions of exact integer
    block sums; their mean and squared deviations accumulate as scaled
    BIGINTs over the {b}-row block table; 1.96 is the shared rounded
    z constant (dyadic-irrelevant: same decimal, same double).

    Scale shape: one block aggregate, {b}-row algebra after.
    """
    from tvbigdataproject_spark.functions.hashing import hex16_hash

    orders = read_table(spark, sf_dir, "orders")
    blk = orders.select(
        (hex16_hash(F.col("o_orderkey").cast("string")) % _JK_B).alias(
            "blk"
        ),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    per = blk.groupBy("blk").agg(
        F.count(F.lit(1)).alias("n_i"),
        F.sum("cents").cast("long").alias("s_i"),
    )
    tot = per.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.sum("s_i").cast("long").alias("s"),
        F.count(F.lit(1)).alias("nb"),
    )
    theta = per.crossJoin(F.broadcast(tot)).selectExpr(
        "blk",
        "CAST(s - s_i AS DOUBLE) / CAST(n - n_i AS DOUBLE) AS th",
        "n",
        "s",
        "nb",
    )
    tbar = theta.agg(
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.max("nb").alias("nb"),
        F.expr(
            f"CAST(SUM(CAST(ROUND(th * {_S}) AS BIGINT)) AS DOUBLE)"
            f" / CAST({_S} AS DOUBLE) / CAST(MAX(nb) AS DOUBLE)"
        ).alias("th_bar"),
    )
    j = theta.crossJoin(F.broadcast(tbar.select("th_bar", F.col("nb").alias("_nb"))))
    var = (
        f"CAST(SUM(CAST(ROUND((th - th_bar) * (th - th_bar) * {_S2})"
        f" AS BIGINT)) AS DOUBLE) / CAST({_S2} AS DOUBLE)"
    )
    se = (
        f"sqrt(CAST(MAX(_nb) - 1 AS DOUBLE) / CAST(MAX(_nb) AS DOUBLE)"
        f" * ({var}))"
    )
    mean = "CAST(MAX(s) AS DOUBLE) / CAST(MAX(n) AS DOUBLE)"
    return j.agg(
        F.max("n").alias("n"),
        F.expr(f"{mean} AS mean_c"),
        F.expr(f"{se} AS se_jack"),
        F.expr(
            f"{mean} - CAST(1.959963985 AS DOUBLE) * {se} AS ci_lo_c"
        ),
        F.expr(
            f"{mean} + CAST(1.959963985 AS DOUBLE) * {se} AS ci_hi_c"
        ),
    )


block_jackknife_ci.__doc__ = block_jackknife_ci.__doc__.format(b=_JK_B)


# ---------------------------------------------------------------- Q39

_RT_Z = (
    "(CAST(k1 AS DOUBLE) / CAST(t1 AS DOUBLE)"
    " - CAST(k2 AS DOUBLE) / CAST(t2 AS DOUBLE))"
    " / sqrt(CAST(k1 AS DOUBLE)"
    " / (CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE))"
    " + CAST(k2 AS DOUBLE)"
    " / (CAST(t2 AS DOUBLE) * CAST(t2 AS DOUBLE)))"
)


def _rt_sql() -> str:
    base = """
    SELECT
        CAST(SUM(CASE WHEN wd >= 6 AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS k1,
        CAST(SUM(CASE WHEN wd < 6 AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS k2,
        CAST(COUNT(DISTINCT CASE WHEN wd >= 6 THEN day END)
             AS BIGINT) AS t1,
        CAST(COUNT(DISTINCT CASE WHEN wd < 6 THEN day END)
             AS BIGINT) AS t2
    FROM (SELECT CAST(ts AS DATE) AS day,
                 isodow(CAST(ts AS DATE)) AS wd, event_type
          FROM events)
    """
    body = sql_wrap_stages(
        f"(SELECT *, {_RT_Z} AS z FROM ({base}))",
        pnorm_stages("CAST(0 AS DOUBLE) - abs(z)", "_phi", "_rt_"),
    )
    return f"""
    SELECT k1, k2, t1, t2, z,
           CAST(2 AS DOUBLE) * _phi AS p_two_sided
    FROM {body}
    """


@query(
    "poisson_rate_ztest",
    sql=_rt_sql(),
    tags=("analytics", "stats", "inference"),
)
def poisson_rate_ztest(spark, sf_dir):
    """Weekend-vs-weekday purchase-rate comparison as a two-sample
    Poisson rate z-test (exposures = distinct observed days per arm),
    with the two-sided portable-CDF p-value — the rate-difference
    readout behind any "did the event volume really change" question.

    Exactness: counts and exposures are exact integers; z is one
    identically-spelled IEEE expression; p = 2 Phi(-|z|) through the
    portable kernel. Day-of-week is ISO in both engines.

    Scale shape: one conditional-count scan to a single row.
    """
    ev = read_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        (F.weekday(F.to_date("ts")) + 1).alias("wd"),
        "event_type",
    )
    base = ev.agg(
        F.sum(
            F.when(
                (F.col("wd") >= 6) & (F.col("event_type") == "purchase"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("k1"),
        F.sum(
            F.when(
                (F.col("wd") < 6) & (F.col("event_type") == "purchase"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("k2"),
        F.countDistinct(
            F.when(F.col("wd") >= 6, F.col("day"))
        )
        .cast("long")
        .alias("t1"),
        F.countDistinct(F.when(F.col("wd") < 6, F.col("day")))
        .cast("long")
        .alias("t2"),
    )
    scored = base.selectExpr("*", f"{_RT_Z} AS z")
    out = apply_stages(
        scored,
        pnorm_stages("CAST(0 AS DOUBLE) - abs(z)", "_phi", "_rt_"),
    )
    return out.selectExpr(
        "k1", "k2", "t1", "t2", "z",
        "CAST(2 AS DOUBLE) * _phi AS p_two_sided",
    )


# ---------------------------------------------------------------- Q40

# overdispersion z: (VMR - 1) * sqrt((n - 1) / 2) — the normal
# approximation to the chi-square dispersion test (documented approx)
_DI_Z = (
    "(vmr - CAST(1 AS DOUBLE))"
    " * sqrt(CAST(nd - 1 AS DOUBLE) / CAST(2 AS DOUBLE))"
)


def _di_sql() -> str:
    base = """
    SELECT event_type, COUNT(*) AS nd,
           CAST(SUM(c) AS BIGINT) AS s,
           SUM(CAST(c AS HUGEINT) * c) AS sq
    FROM (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ) GROUP BY 1
    """
    from tvbigdataproject_spark.queries._stable import (
        sql_huge_to_double_wide,
    )

    vmr = (
        f"(({sql_huge_to_double_wide('sq')}) / CAST(nd AS DOUBLE)"
        " - (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))"
        " * (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)))"
        " / (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))"
    )
    body = sql_wrap_stages(
        f"""(SELECT event_type, nd, s, {vmr} AS vmr,
             (({vmr}) - CAST(1 AS DOUBLE))
             * sqrt(CAST(nd - 1 AS DOUBLE) / CAST(2 AS DOUBLE)) AS z
             FROM ({base}))""",
        pnorm_stages("CAST(0 AS DOUBLE) - abs(z)", "_phi", "_di_"),
    )
    return f"""
    SELECT event_type, nd AS n_days, s AS n_events, vmr, z,
           CAST(2 AS DOUBLE) * _phi AS p_two_sided
    FROM {body}
    """


@query(
    "dispersion_index_by_type",
    sql=_di_sql(),
    tags=("analytics", "stats", "monitoring"),
)
def dispersion_index_by_type(spark, sf_dir):
    """Variance-to-mean ratio of DAILY event counts per type, with the
    normal-approximation overdispersion z and p — the Poisson-ness
    check that decides whether sqrt(n) alarm thresholds are valid for
    a feed (VMR >> 1 = bursty/overdispersed; use negative-binomial
    bands instead). Population variance of the day-grid counts;
    the (VMR - 1) sqrt((n-1)/2) normal approximation is the documented
    estimator (exact chi-square tails need data-driven df).

    Exactness: day counts are integers; squared sums lift to 128-bit
    (HUGEINT / DECIMAL(38,0)) through the agreed split-cast; VMR and z
    are identically-spelled IEEE expressions; p via portable Phi.

    Scale shape: one (type, day) aggregate (calendar x type bounded),
    one 5-row reduce.
    """
    from tvbigdataproject_spark.queries._stable import dec_to_double_wide

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    base = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sq"),
    )
    base = base.select(
        "event_type",
        "nd",
        "s",
        dec_to_double_wide(F.col("sq")).alias("sqd"),
    )
    vmr = (
        "((sqd) / CAST(nd AS DOUBLE)"
        " - (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))"
        " * (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)))"
        " / (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))"
    )
    scored = base.selectExpr(
        "event_type",
        "nd",
        "s",
        f"{vmr} AS vmr",
        f"(({vmr}) - CAST(1 AS DOUBLE))"
        " * sqrt(CAST(nd - 1 AS DOUBLE) / CAST(2 AS DOUBLE)) AS z",
    )
    out = apply_stages(
        scored,
        pnorm_stages("CAST(0 AS DOUBLE) - abs(z)", "_phi", "_di_"),
    )
    return out.selectExpr(
        "event_type",
        "nd AS n_days",
        "s AS n_events",
        "vmr",
        "z",
        "CAST(2 AS DOUBLE) * _phi AS p_two_sided",
    )
