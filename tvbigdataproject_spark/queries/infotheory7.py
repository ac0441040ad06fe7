"""Portable-ln batch 7: the events-table monitoring family.

- psi_value_drift            Population Stability Index between the
                             first/second-half value distributions —
                             THE industry drift score, which
                             analytic10.py::tvd_value_drift documents
                             as blocked ("PSI needs ln"); same bins,
                             same split, now the real metric
- user_behavior_entropy_bands  per-user event-type entropy, banded —
                             the behavioral-diversity histogram (bots
                             collapse to 0; scripted scrapers sit in
                             one narrow band)
- event_type_entropy_daily   daily event-type mix entropy — the
                             one-line feed monitor that fires when a
                             producer starts emitting only one type
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

# ---------------------------------------------------------------- Q26

_PSI_BINS = 10  # tvd_value_drift's binning, shared edges over global range

# smoothed shares p = (c+1)/(C+B); contribution (pa - pb) ln(pa/pb)
_PSI_LR = "(_lca - _lta) - (_lcb - _ltb)"
_PSI_PA = "CAST(ca + 1 AS DOUBLE) / CAST(ta + {b} AS DOUBLE)"
_PSI_PB = "CAST(cb + 1 AS DOUBLE) / CAST(tb + {b} AS DOUBLE)"


def _psi_bins_sql() -> str:
    return f"""
    SELECT g.bin, g.ca, g.cb, t.ta, t.tb FROM
    (
        SELECT t.i AS bin, COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb
        FROM range({_PSI_BINS}) t(i) LEFT JOIN (
            SELECT bin,
                   COUNT(*) FILTER (WHERE period = 0) AS ca,
                   COUNT(*) FILTER (WHERE period = 1) AS cb
            FROM (
                SELECT CASE WHEN date_diff('day', b.d0, CAST(e.ts AS DATE))
                                 < b.n_days // 2
                            THEN 0 ELSE 1 END AS period,
                       LEAST({_PSI_BINS - 1},
                             CAST(FLOOR((e.value - b.vmin) * {_PSI_BINS}.0
                                        / (b.vmax - b.vmin)) AS BIGINT))
                           AS bin
                FROM events e CROSS JOIN (
                    SELECT min(CAST(ts AS DATE)) AS d0,
                           date_diff('day', min(CAST(ts AS DATE)),
                                     max(CAST(ts AS DATE))) + 1 AS n_days,
                           min(value) AS vmin, max(value) AS vmax
                    FROM events
                ) b
            ) GROUP BY 1
        ) c ON c.bin = t.i
    ) g
    CROSS JOIN (
        SELECT CAST(SUM(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS ta,
               CAST(SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS tb
        FROM (
            SELECT CASE WHEN date_diff('day', b.d0, CAST(e.ts AS DATE))
                             < b.n_days // 2
                        THEN 0 ELSE 1 END AS period
            FROM events e CROSS JOIN (
                SELECT min(CAST(ts AS DATE)) AS d0,
                       date_diff('day', min(CAST(ts AS DATE)),
                                 max(CAST(ts AS DATE))) + 1 AS n_days
                FROM events
            ) b
        )
    ) t
    """


def _psi_sql() -> str:
    per = _psi_bins_sql()
    for src, out, p in (
        ("ca + 1", "_lca", "_y1_"),
        (f"ta + {_PSI_BINS}", "_lta", "_y2_"),
        ("cb + 1", "_lcb", "_y3_"),
        (f"tb + {_PSI_BINS}", "_ltb", "_y4_"),
    ):
        per = sql_wrap_stages(f"({per})", plog_stages(src, out, p))
    pa = _PSI_PA.format(b=_PSI_BINS)
    pb = _PSI_PB.format(b=_PSI_BINS)
    contrib = f"(({pa}) - ({pb})) * ({_PSI_LR})"
    return f"""
    SELECT bin, ca, cb, {contrib} AS psi_contrib,
           CAST(SUM(CAST(ROUND(({contrib}) * 1000000000) AS BIGINT))
                OVER () AS DOUBLE) / CAST(1000000000 AS DOUBLE)
               AS psi_total
    FROM {per}
    """


@query(
    "psi_value_drift",
    sql=_psi_sql(),
    tags=("analytic", "drift", "monitoring", "infotheory"),
)
def psi_value_drift(spark, sf_dir):
    """Population Stability Index between the first- and second-half
    event-value distributions, on tvd_value_drift's exact binning (10
    shared equi-width bins, integer day-index half-split) — the metric
    that query's docstring records as blocked because "PSI needs ln".
    Add-one smoothing keeps empty bins finite (the textbook PSI
    convention for zero cells). Thresholds from practice apply: < 0.1
    stable, > 0.25 drifted.

    Exactness: each bin's log-ratio is four portable lns of INTEGER
    arguments; the smoothed shares are identically-spelled divisions;
    the total is a scaled-BIGINT sum over the bounded 10-row bin table
    (allowlisted window class, same as TVD's).

    Scale shape: identical to tvd_value_drift — one bounds row
    broadcast onto the scan, one grouped count to 10 rows.
    """
    from pyspark.sql import Window as W

    ev = read_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "value"
    )
    b = ev.agg(
        F.min("day").alias("d0"),
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("n_days"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    pe = ev.crossJoin(F.broadcast(b)).select(
        F.when(
            F.datediff(F.col("day"), F.col("d0"))
            < F.expr("n_days div 2"),
            0,
        )
        .otherwise(1)
        .alias("period"),
        F.least(
            F.lit(_PSI_BINS - 1),
            F.floor(
                (F.col("value") - F.col("vmin"))
                * float(_PSI_BINS)
                / (F.col("vmax") - F.col("vmin"))
            ).cast("long"),
        ).alias("bin"),
    )
    c = pe.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).alias("cb"),
    )
    grid = spark.range(_PSI_BINS).select(F.col("id").alias("bin"))
    g = (
        grid.join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    # period totals derive from the 10-row bin table (every event lands
    # in exactly one bin) — two corpus scans total (bounds + binning)
    t = g.agg(
        F.sum("ca").cast("long").alias("ta"),
        F.sum("cb").cast("long").alias("tb"),
    )
    per = g.crossJoin(F.broadcast(t))
    for src, out, p in (
        ("ca + 1", "_lca", "_y1_"),
        (f"ta + {_PSI_BINS}", "_lta", "_y2_"),
        ("cb + 1", "_lcb", "_y3_"),
        (f"tb + {_PSI_BINS}", "_ltb", "_y4_"),
    ):
        per = apply_stages(per, plog_stages(src, out, p))
    pa = _PSI_PA.format(b=_PSI_BINS)
    pb = _PSI_PB.format(b=_PSI_BINS)
    contrib = f"(({pa}) - ({pb})) * ({_PSI_LR})"
    scored = per.selectExpr(
        "bin", "ca", "cb", f"{contrib} AS psi_contrib",
        f"CAST(ROUND(({contrib}) * 1000000000) AS BIGINT) AS _ps",
    )
    w = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return scored.select(
        "bin",
        "ca",
        "cb",
        "psi_contrib",
        (
            F.sum("_ps").over(w).cast("double")
            / F.lit(1000000000).cast("double")
        ).alias("psi_total"),
    )


# ---------------------------------------------------------------- Q27


def _ube_sql() -> str:
    cnt = sql_wrap_stages(
        """
        SELECT user_id, event_type, COUNT(*) AS c FROM events
        GROUP BY 1, 2
        """,
        plog_stages("c", "_lc", "_u1_"),
    )
    per = sql_wrap_stages(
        f"""
        SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
               SUM(CAST(ROUND(c * _lc * 1000000) AS BIGINT)) AS wsum
        FROM {cnt} GROUP BY 1
        """,
        plog_stages("n_events", "_ln", "_u2_"),
    )
    h = (
        "_ln - (CAST(wsum AS DOUBLE) / CAST(1000000 AS DOUBLE))"
        " / CAST(n_events AS DOUBLE)"
    )
    return f"""
    SELECT CAST(FLOOR(({h}) * 20) AS BIGINT) AS band,
           COUNT(*) AS n_users,
           MIN({h}) AS min_h,
           MAX({h}) AS max_h,
           CAST(SUM(CAST(ROUND(({h}) * 1000000000) AS BIGINT)) AS DOUBLE)
               / CAST(1000000000 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_h
    FROM {per}
    GROUP BY 1
    """


@query(
    "user_behavior_entropy_bands",
    sql=_ube_sql(),
    tags=("analytic", "infotheory", "monitoring"),
)
def user_behavior_entropy_bands(spark, sf_dir):
    """Histogram of per-user event-type entropy (0.05-nat bands) —
    the behavioral-diversity fingerprint: bots and single-purpose
    scripts collapse into band 0, organic users spread toward
    ln(#types); a new spike in a low band is an automation signature.

    Exactness: per-user H = ln n - (sum c ln c)/n with portable lns of
    INTEGER counts and scaled-BIGINT weighted sums; H is bitwise-equal
    per user, so FLOOR(H * 20) bands identically; band stats are exact
    integer/stable aggregates.

    Scale shape: two keyed aggregates (user x type, then user) and a
    bounded ~35-row band table — the per-user table shuffles once on
    user_id.
    """
    ev = read_table(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    cnt = apply_stages(cnt, plog_stages("c", "_lc", "_u1_"))
    per = cnt.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.sum(
            F.expr("CAST(ROUND(c * _lc * 1000000) AS BIGINT)")
        ).alias("wsum"),
    )
    per = apply_stages(per, plog_stages("n_events", "_ln", "_u2_"))
    h = (
        "_ln - (CAST(wsum AS DOUBLE) / CAST(1000000 AS DOUBLE))"
        " / CAST(n_events AS DOUBLE)"
    )
    return per.groupBy(
        F.expr(f"CAST(FLOOR(({h}) * 20) AS BIGINT)").alias("band")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.expr(f"MIN({h})").alias("min_h"),
        F.expr(f"MAX({h})").alias("max_h"),
        F.expr(
            f"CAST(SUM(CAST(ROUND(({h}) * 1000000000) AS BIGINT))"
            " AS DOUBLE) / CAST(1000000000 AS DOUBLE)"
            " / CAST(COUNT(*) AS DOUBLE)"
        ).alias("mean_h"),
    )


# ---------------------------------------------------------------- Q28


def _ete_sql() -> str:
    cnt = sql_wrap_stages(
        """
        SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS c
        FROM events GROUP BY 1, 2
        """,
        plog_stages("c", "_lc", "_d1_"),
    )
    per = sql_wrap_stages(
        f"""
        SELECT day, CAST(SUM(c) AS BIGINT) AS n_events,
               COUNT(*) AS n_types,
               SUM(CAST(ROUND(c * _lc * 1000000) AS BIGINT)) AS wsum
        FROM {cnt} GROUP BY 1
        """,
        plog_stages("n_events", "_ln", "_d2_"),
    )
    return f"""
    SELECT day, n_events, n_types,
           _ln - (CAST(wsum AS DOUBLE) / CAST(1000000 AS DOUBLE))
               / CAST(n_events AS DOUBLE) AS entropy_nats
    FROM {per}
    """


@query(
    "event_type_entropy_daily",
    sql=_ete_sql(),
    tags=("analytic", "infotheory", "monitoring", "timeseries"),
)
def event_type_entropy_daily(spark, sf_dir):
    """Daily entropy of the event-type mix — the one-line feed-health
    series: a day whose entropy collapses means one producer flooded
    the stream (or the others went silent), before any volume alarm
    fires. Pairs with stl_weekly_decompose for seasonal thresholds.

    Exactness: per-day H from portable lns of INTEGER counts with
    scaled-BIGINT weighted sums — the token_entropy_by_source kernel
    on the (day, type) grid.

    Scale shape: one (day, type) aggregate (bounded by calendar x
    type domain), then a day-grid aggregate; scan-shaped at any SF.
    """
    ev = read_table(spark, sf_dir, "events")
    cnt = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    cnt = apply_stages(cnt, plog_stages("c", "_lc", "_d1_"))
    per = cnt.groupBy("day").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(
            F.expr("CAST(ROUND(c * _lc * 1000000) AS BIGINT)")
        ).alias("wsum"),
    )
    per = apply_stages(per, plog_stages("n_events", "_ln", "_d2_"))
    return per.selectExpr(
        "day",
        "n_events",
        "n_types",
        "_ln - (CAST(wsum AS DOUBLE) / CAST(1000000 AS DOUBLE))"
        " / CAST(n_events AS DOUBLE) AS entropy_nats",
    )
