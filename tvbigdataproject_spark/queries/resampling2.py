"""Monitoring-tier follow-ups: what to fit when Poisson fails, and how
predictable the event stream is.

- negbin_fit_by_type        method-of-moments negative-binomial fit of
                            daily counts per event type — the
                            distribution dispersion_index_by_type says
                            to use when VMR > 1 (its r, p feed NB alarm
                            bands directly)
- transition_entropy_events H(next type | current type) per user
                            stream, plus the unconditional type entropy
                            — the predictability pair for the event
                            feed (the events twin of
                            ngram_entropy_ladder's text orders 1-2)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.portable import (
    apply_stages,
    plog_stages,
    sql_wrap_stages,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# ---------------------------------------------------------------- Q42


@query(
    "negbin_fit_by_type",
    sql=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    mom AS (
        SELECT event_type, COUNT(*) AS nd,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(SUM(c * c) AS BIGINT) AS sq
        FROM daily GROUP BY 1
    )
    SELECT event_type, nd AS n_days, s AS n_events,
           CAST(s AS DOUBLE) / CAST(nd AS DOUBLE) AS mean_daily,
           CAST(sq AS DOUBLE) / CAST(nd AS DOUBLE)
               - (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
               * (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)) AS var_daily,
           CASE WHEN CAST(sq AS DOUBLE) / CAST(nd AS DOUBLE)
                     - (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
                     * (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
                     > CAST(s AS DOUBLE) / CAST(nd AS DOUBLE) THEN
               (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
               * (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
               / (CAST(sq AS DOUBLE) / CAST(nd AS DOUBLE)
                  - (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
                  * (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
                  - CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
           END AS r_mom,
           CASE WHEN CAST(sq AS DOUBLE) / CAST(nd AS DOUBLE)
                     - (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
                     * (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
                     > CAST(s AS DOUBLE) / CAST(nd AS DOUBLE) THEN
               (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
               / (CAST(sq AS DOUBLE) / CAST(nd AS DOUBLE)
                  - (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
                  * (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)))
           END AS p_mom
    FROM mom
    """,
    tags=("analytics", "stats", "monitoring"),
)
def negbin_fit_by_type(spark, sf_dir):
    """Method-of-moments negative-binomial fit (standard NB2
    parameterization: r = m^2/(v - m), p = m/v) of
    DAILY event counts per type — the alarm-band distribution for
    overdispersed feeds (dispersion_index_by_type decides IF Poisson
    fails; this supplies the replacement's parameters). NULL when the
    sample is underdispersed (v <= m: NB cannot fit; use Poisson).

    Exactness: day counts are small integers (sq fits int64 by orders
    of magnitude); moments and both parameters are identically-spelled
    IEEE expressions of two exact aggregates.

    Scale shape: one (type, day) aggregate + a 5-row reduce.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sq"),
    )
    m = "CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)"
    v = (
        f"CAST(sq AS DOUBLE) / CAST(nd AS DOUBLE) - ({m}) * ({m})"
    )
    return mom.selectExpr(
        "event_type",
        "nd AS n_days",
        "s AS n_events",
        f"{m} AS mean_daily",
        f"{v} AS var_daily",
        f"CASE WHEN {v} > {m} THEN"
        f" ({m}) * ({m}) / (({v}) - ({m})) END AS r_mom",
        f"CASE WHEN {v} > {m} THEN ({m}) / ({v}) END AS p_mom",
    )


# ---------------------------------------------------------------- Q43


def _te_sql() -> str:
    pairs = """
    SELECT cur, nxt FROM (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS nxt
        FROM events
    ) WHERE nxt IS NOT NULL
    """
    c2 = sql_wrap_stages(
        f"SELECT cur, nxt, COUNT(*) AS c FROM ({pairs}) GROUP BY 1, 2",
        plog_stages("c", "_lc", "_t1_"),
    )
    c1 = sql_wrap_stages(
        f"""
        (SELECT cur, CAST(SUM(c) AS BIGINT) AS pc FROM
            (SELECT cur, nxt, COUNT(*) AS c FROM ({pairs}) GROUP BY 1, 2)
         GROUP BY cur)
        """,
        plog_stages("pc", "_lp", "_t2_"),
    )
    tot = sql_wrap_stages(
        f"""
        (SELECT CAST(SUM(c) AS BIGINT) AS n_pairs FROM
            (SELECT cur, nxt, COUNT(*) AS c FROM ({pairs}) GROUP BY 1, 2))
        """,
        plog_stages("n_pairs", "_ln", "_t3_"),
    )
    return f"""
    SELECT t.n_pairs,
           (CAST(pg.p_s AS DOUBLE) - CAST(cg.s_s AS DOUBLE))
               / CAST(1000000 AS DOUBLE) / CAST(t.n_pairs AS DOUBLE)
               AS h_cond_nats,
           t._ln - CAST(pg.p_s AS DOUBLE) / CAST(1000000 AS DOUBLE)
               / CAST(t.n_pairs AS DOUBLE) AS h_marginal_nats
    FROM
        (SELECT CAST(SUM(CAST(ROUND(c * _lc * 1000000) AS BIGINT))
                     AS BIGINT) AS s_s
         FROM {c2}) cg
    CROSS JOIN
        (SELECT CAST(SUM(CAST(ROUND(pc * _lp * 1000000) AS BIGINT))
                     AS BIGINT) AS p_s
         FROM {c1}) pg
    CROSS JOIN (SELECT n_pairs, _ln FROM {tot}) t
    """


@query(
    "transition_entropy_events",
    sql=_te_sql(),
    tags=("analytic", "infotheory", "monitoring"),
)
def transition_entropy_events(spark, sf_dir):
    """The event stream's predictability pair: H(next type | current
    type) over per-user transitions and the marginal transition-source
    entropy H(current) — the events twin of ngram_entropy_ladder's
    orders 1-2 (conditional << marginal means the stream is a
    near-deterministic state machine; equal means types are memoryless
    noise; the GAP is the mutual information between consecutive
    events).

    Exactness: H(nxt|cur) = (sum pc ln pc - sum c ln c)/N and
    H(cur) = ln N - (sum pc ln pc)/N from portable lns of INTEGER
    transition counts with scaled-BIGINT sums (the prefix-margin
    identity of ngram_entropy_ladder).

    Scale shape: one user-partitioned LEAD window + a (cur, nxt)
    aggregate (type-domain bounded); margins derive from the pair
    aggregate.
    """
    from pyspark.sql import Window as W

    ev = read_table(spark, sf_dir, "events")
    pairs = (
        ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type")
            .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
    )
    c2 = pairs.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    c2l = apply_stages(c2, plog_stages("c", "_lc", "_t1_"))
    c1 = c2.groupBy("cur").agg(F.sum("c").cast("long").alias("pc"))
    c1l = apply_stages(c1, plog_stages("pc", "_lp", "_t2_"))
    tot = c2.agg(F.sum("c").cast("long").alias("n_pairs"))
    totl = apply_stages(tot, plog_stages("n_pairs", "_ln", "_t3_"))
    cg = c2l.agg(
        F.sum(F.expr("CAST(ROUND(c * _lc * 1000000) AS BIGINT)"))
        .cast("long")
        .alias("s_s")
    )
    pg = c1l.agg(
        F.sum(F.expr("CAST(ROUND(pc * _lp * 1000000) AS BIGINT)"))
        .cast("long")
        .alias("p_s")
    )
    return (
        cg.crossJoin(F.broadcast(pg))
        .crossJoin(F.broadcast(totl.select("n_pairs", "_ln")))
        .selectExpr(
            "n_pairs",
            "(CAST(p_s AS DOUBLE) - CAST(s_s AS DOUBLE))"
            " / CAST(1000000 AS DOUBLE) / CAST(n_pairs AS DOUBLE)"
            " AS h_cond_nats",
            "_ln - CAST(p_s AS DOUBLE) / CAST(1000000 AS DOUBLE)"
            " / CAST(n_pairs AS DOUBLE) AS h_marginal_nats",
        )
    )
