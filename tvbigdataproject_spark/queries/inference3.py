"""Inference tier 3: threshold selection for the quality scorer.

- pr_curve_quality  precision / recall / F1 at 21 evenly spaced
                    probability thresholds, with the argmax-F1 row
                    flagged — the threshold-picking readout that turns
                    auc_quality_langid's rank view and
                    calibration_ece_quality's probability view into an
                    operating point.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.inference2 import (
    _scored_df,
    _scored_sql,
)
from tvbigdataproject_spark.queries.registry import query

_NT = 21  # thresholds 0.00, 0.05, ..., 1.00


@query(
    "pr_curve_quality",
    sql=f"""
    WITH scored AS (SELECT * FROM {_scored_sql()}),
    t AS (
        SELECT CAST(SUM(pos) AS BIGINT) AS pos_total,
               COUNT(*) AS n
        FROM scored
    ),
    grid AS (
        SELECT g.i AS ti,
               CAST(g.i AS DOUBLE) / CAST({_NT - 1} AS DOUBLE) AS thr
        FROM range({_NT}) g(i)
    ),
    cells AS (
        SELECT grid.ti, grid.thr,
               CAST(SUM(CASE WHEN s.p >= grid.thr AND s.pos = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN s.p >= grid.thr AND s.pos = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS fp
        FROM scored s CROSS JOIN grid
        GROUP BY 1, 2
    ),
    m AS (
        SELECT c.ti, c.thr, c.tp, c.fp, t.pos_total - c.tp AS fn,
               CASE WHEN c.tp + c.fp > 0 THEN
                   CAST(c.tp AS DOUBLE) / CAST(c.tp + c.fp AS DOUBLE)
               END AS precision,
               CAST(c.tp AS DOUBLE) / CAST(t.pos_total AS DOUBLE)
                   AS recall,
               CASE WHEN 2 * c.tp + c.fp + (t.pos_total - c.tp) > 0 THEN
                   CAST(2 * c.tp AS DOUBLE)
                   / CAST(2 * c.tp + c.fp + (t.pos_total - c.tp)
                          AS DOUBLE)
               END AS f1
        FROM cells c CROSS JOIN t
    ),
    best AS (
        SELECT MAX(CASE WHEN f1 IS NOT NULL THEN
                       CAST(ROUND(f1 * 1000000000) AS BIGINT) * 100
                       + (99 - ti) END) AS bk
        FROM m
    )
    SELECT m.ti, m.thr, m.tp, m.fp, m.fn, m.precision, m.recall, m.f1,
           CASE WHEN m.f1 IS NOT NULL
                     AND CAST(ROUND(m.f1 * 1000000000) AS BIGINT) * 100
                         + (99 - m.ti) = best.bk
                THEN 1 ELSE 0 END AS is_best_f1
    FROM m CROSS JOIN best
    """,
    tags=("llm", "ml-eval", "inference"),
)
def pr_curve_quality(spark, sf_dir):
    """Precision/recall/F1 of the logistic quality scorer at {nt}
    probability thresholds, with the argmax-F1 operating point flagged
    — threshold selection, the decision the AUC and calibration audits
    feed. F1 counts stay integer (2tp / (2tp + fp + fn)); the argmax
    breaks ties toward the LOWER threshold via an integer composite
    key (scaled F1 * 100 + (99 - ti)), so the flag is deterministic
    even under exact F1 ties.

    Exactness: p is the bitwise-equal portable sigmoid; threshold
    comparisons p >= k/20 use identically-computed grid doubles; every
    confusion count is an exact integer.

    Scale shape: one scan fans each row onto the 21-row broadcast
    threshold grid and reduces map-side — a 21x scan-local multiply,
    no window over data.
    """
    scored = _scored_df(spark, sf_dir)
    grid = spark.range(_NT).selectExpr(
        "id AS ti",
        f"CAST(id AS DOUBLE) / CAST({_NT - 1} AS DOUBLE) AS thr",
    )
    t = scored.agg(
        F.sum("pos").cast("long").alias("pos_total"),
        F.count(F.lit(1)).alias("n"),
    )
    cells = (
        scored.crossJoin(F.broadcast(grid))
        .groupBy("ti", "thr")
        .agg(
            F.sum(
                F.when((F.col("p") >= F.col("thr")) & (F.col("pos") == 1), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("tp"),
            F.sum(
                F.when((F.col("p") >= F.col("thr")) & (F.col("pos") == 0), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("fp"),
        )
    )
    m = cells.crossJoin(F.broadcast(t)).selectExpr(
        "ti",
        "thr",
        "tp",
        "fp",
        "pos_total - tp AS fn",
        "CASE WHEN tp + fp > 0 THEN"
        " CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision",
        "CAST(tp AS DOUBLE) / CAST(pos_total AS DOUBLE) AS recall",
        "CASE WHEN 2 * tp + fp + (pos_total - tp) > 0 THEN"
        " CAST(2 * tp AS DOUBLE)"
        " / CAST(2 * tp + fp + (pos_total - tp) AS DOUBLE) END AS f1",
    )
    best = m.agg(
        F.max(
            F.expr(
                "CASE WHEN f1 IS NOT NULL THEN"
                " CAST(ROUND(f1 * 1000000000) AS BIGINT) * 100"
                " + (99 - ti) END"
            )
        ).alias("bk")
    )
    return m.crossJoin(F.broadcast(best)).selectExpr(
        "ti",
        "thr",
        "tp",
        "fp",
        "fn",
        "precision",
        "recall",
        "f1",
        "CASE WHEN f1 IS NOT NULL"
        " AND CAST(ROUND(f1 * 1000000000) AS BIGINT) * 100"
        " + (99 - ti) = bk THEN 1 ELSE 0 END AS is_best_f1",
    )


pr_curve_quality.__doc__ = pr_curve_quality.__doc__.format(nt=_NT)
