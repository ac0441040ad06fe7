"""Inference tier 2: probability-quality evals for the logistic scorer.

- calibration_ece_quality  reliability bins + expected calibration
                           error + Brier score of the logistic quality
                           probability against the en-label — the
                           "can you trust the probabilities" audit
                           that AUC (rank-only) cannot answer
- lift_gain_deciles        cumulative gains / lift table by score
                           decile — the targeting readout (how much of
                           the positive class do the top-k% capture)

Both ride the bitwise-equal p_keep = sigmoid(w . f) probability from
the portable exp kernel (infotheory2's feature formula), so bins,
deciles, and every tie resolve identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.portable import (
    apply_stages,
    pexp_stages,
    sql_wrap_stages,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# shared: per-doc (pos, p_keep) through the logistic feature formula
_LQ_STATS = """
    SELECT doc_id, lang, COUNT(*) AS n_tok,
           CAST(SUM(length(w)) AS BIGINT) AS n_chr,
           SUM(CASE WHEN regexp_matches(w, '[0-9]') THEN 1 ELSE 0 END)
               AS n_dig
    FROM (SELECT doc_id, lang,
                 unnest(string_split(lower(text), ' ')) AS w
          FROM documents)
    GROUP BY 1, 2
"""

_LQ_Z = (
    "(CAST(-2 AS DOUBLE) + CAST(0.5 AS DOUBLE)"
    " * (CAST(n_tok AS DOUBLE) / CAST(100 AS DOUBLE)))"
    " + (CAST(0.25 AS DOUBLE)"
    " * (CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE))"
    " - CAST(4 AS DOUBLE)"
    " * (CAST(n_dig AS DOUBLE) / CAST(n_tok AS DOUBLE)))"
)


def _scored_sql() -> str:
    z = f"""
    SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos, {_LQ_Z} AS z
    FROM ({_LQ_STATS})
    """
    body = sql_wrap_stages(
        f"({z})",
        pexp_stages("CAST(0 AS DOUBLE) - z", "_enz", "_cq_"),
    )
    return (
        f"(SELECT pos, CAST(1 AS DOUBLE)"
        f" / (CAST(1 AS DOUBLE) + _enz) AS p FROM {body})"
    )


def _scored_df(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    stats = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower("text"), " ")).alias("w"),
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(F.length("w")).cast("long").alias("n_chr"),
            F.sum(
                F.when(F.col("w").rlike("[0-9]"), 1).otherwise(0)
            ).alias("n_dig"),
        )
    )
    z = stats.selectExpr(
        "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos",
        f"{_LQ_Z} AS z",
    )
    body = apply_stages(
        z, pexp_stages("CAST(0 AS DOUBLE) - z", "_enz", "_cq_")
    )
    return body.selectExpr(
        "pos", "CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + _enz) AS p"
    )


# ---------------------------------------------------------------- Q33


@query(
    "calibration_ece_quality",
    sql=f"""
    WITH scored AS (SELECT * FROM {_scored_sql()}),
    b AS (
        SELECT LEAST(9, CAST(FLOOR(p * 10) AS BIGINT)) AS bin,
               COUNT(*) AS n_b,
               CAST(SUM(pos) AS BIGINT) AS k_b,
               CAST(SUM(CAST(ROUND(p * 1000000000) AS BIGINT))
                    AS BIGINT) AS ps_b,
               CAST(SUM(CAST(ROUND((p - pos) * (p - pos)
                                   * 1000000000) AS BIGINT))
                    AS BIGINT) AS br_b
        FROM scored GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n FROM b)
    SELECT b.bin, b.n_b, b.k_b,
           CAST(b.k_b AS DOUBLE) / CAST(b.n_b AS DOUBLE) AS obs_rate,
           CAST(b.ps_b AS DOUBLE) / CAST(1000000000 AS DOUBLE)
               / CAST(b.n_b AS DOUBLE) AS mean_pred,
           CAST(SUM(abs(b.k_b * 1000000000 - b.ps_b)) OVER ()
                AS DOUBLE) / CAST(1000000000 AS DOUBLE)
               / CAST(t.n AS DOUBLE) AS ece,
           CAST(SUM(b.br_b) OVER () AS DOUBLE)
               / CAST(1000000000 AS DOUBLE) / CAST(t.n AS DOUBLE)
               AS brier
    FROM b CROSS JOIN t
    """,
    tags=("llm", "ml-eval", "inference"),
)
def calibration_ece_quality(spark, sf_dir):
    """Reliability table (10 probability bins), expected calibration
    error, and Brier score of the logistic quality probability against
    the en-label — the probability-quality audit that complements
    auc_quality_langid's rank-only view (a scorer can rank perfectly
    and still be uncalibrated; ECE is what answers "is p = 0.9 really
    90%?").

    Exactness: p is bitwise-equal (portable sigmoid), so bin
    assignment FLOOR(10p) is identical; per-bin predicted mass and
    Brier contributions accumulate as scaled BIGINTs, and ECE's
    |k_b - sum p| numerator stays in exact integer units until one
    final division. The bin table is 10 rows (allowlisted window
    class for the across-bin totals).

    Scale shape: one token-stats aggregate + a 10-row bin aggregate.
    """
    from pyspark.sql import Window as W

    scored = _scored_df(spark, sf_dir)
    b = scored.groupBy(
        F.least(F.lit(9), F.floor(F.col("p") * 10).cast("long")).alias(
            "bin"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum("pos").cast("long").alias("k_b"),
        F.sum(F.expr("CAST(ROUND(p * 1000000000) AS BIGINT)"))
        .cast("long")
        .alias("ps_b"),
        F.sum(
            F.expr(
                "CAST(ROUND((p - pos) * (p - pos) * 1000000000)"
                " AS BIGINT)"
            )
        )
        .cast("long")
        .alias("br_b"),
    )
    t = b.agg(F.sum("n_b").cast("long").alias("n"))
    w = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return b.crossJoin(F.broadcast(t)).select(
        "bin",
        "n_b",
        "k_b",
        (F.col("k_b").cast("double") / F.col("n_b").cast("double")).alias(
            "obs_rate"
        ),
        (
            F.col("ps_b").cast("double")
            / F.lit(1000000000).cast("double")
            / F.col("n_b").cast("double")
        ).alias("mean_pred"),
        (
            F.sum(
                F.abs(F.col("k_b") * 1000000000 - F.col("ps_b"))
            )
            .over(w)
            .cast("double")
            / F.lit(1000000000).cast("double")
            / F.col("n").cast("double")
        ).alias("ece"),
        (
            F.sum("br_b").over(w).cast("double")
            / F.lit(1000000000).cast("double")
            / F.col("n").cast("double")
        ).alias("brier"),
    )


# ---------------------------------------------------------------- Q34

_LIFT_Q = 10000  # the AUC query's quantized-score grid


@query(
    "lift_gain_deciles",
    sql=f"""
    WITH scored AS (SELECT * FROM {_scored_sql()}),
    q AS (
        SELECT CAST(ROUND(p * {_LIFT_Q}) AS BIGINT) AS q,
               COUNT(*) AS n_v,
               CAST(SUM(pos) AS BIGINT) AS k_v
        FROM scored GROUP BY 1
    ),
    c AS (
        SELECT q, n_v, k_v,
               CAST(SUM(n_v) OVER (ORDER BY q DESC) AS BIGINT) AS cum_n,
               CAST(SUM(k_v) OVER (ORDER BY q DESC) AS BIGINT) AS cum_k,
               CAST(SUM(n_v) OVER () AS BIGINT) AS n,
               CAST(SUM(k_v) OVER () AS BIGINT) AS k
        FROM q
    ),
    d AS (
        SELECT CAST(((cum_n - 1) * 10) // n AS BIGINT) AS decile,
               MAX(cum_n) AS cum_n, MAX(cum_k) AS cum_k,
               MAX(n) AS n, MAX(k) AS k
        FROM c GROUP BY 1
    )
    SELECT decile, cum_n, cum_k,
           CAST(cum_k AS DOUBLE) / CAST(k AS DOUBLE) AS gain,
           (CAST(cum_k AS DOUBLE) / CAST(k AS DOUBLE))
               / (CAST(cum_n AS DOUBLE) / CAST(n AS DOUBLE)) AS lift
    FROM d
    """,
    tags=("llm", "ml-eval", "inference"),
)
def lift_gain_deciles(spark, sf_dir):
    """Cumulative gains and lift by score decile for the logistic
    quality scorer against the en-label — the targeting readout ("the
    top 20% of docs by score capture X% of the positives, a lift of
    Y") that turns a ranking into a budget decision.

    Exactness: scores quantize to the AUC query's domain-bounded
    integer grid; cumulative counts run DESCENDING over that grid
    (exact integers); decile edges come from the integer cross-product
    (cum_n - 1) * 10 / n, and gain/lift are single divisions of exact
    integers.

    Scale shape: rows collapse to the per-quantile aggregate first;
    the cumulative window runs over the bounded score grid
    (auc_quality_langid's allowlisted class).
    """
    from pyspark.sql import Window as W

    scored = _scored_df(spark, sf_dir)
    q = scored.groupBy(
        F.expr(f"CAST(ROUND(p * {_LIFT_Q}) AS BIGINT)").alias("q")
    ).agg(
        F.count(F.lit(1)).alias("n_v"),
        F.sum("pos").cast("long").alias("k_v"),
    )
    wd = W.orderBy(F.desc("q"))
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    c = q.select(
        "q",
        "n_v",
        "k_v",
        F.sum("n_v").over(wd).cast("long").alias("cum_n"),
        F.sum("k_v").over(wd).cast("long").alias("cum_k"),
        F.sum("n_v").over(wall).cast("long").alias("n"),
        F.sum("k_v").over(wall).cast("long").alias("k"),
    )
    d = c.groupBy(
        F.expr("CAST(((cum_n - 1) * 10) div n AS BIGINT)").alias("decile")
    ).agg(
        F.max("cum_n").alias("cum_n"),
        F.max("cum_k").alias("cum_k"),
        F.max("n").alias("n"),
        F.max("k").alias("k"),
    )
    return d.selectExpr(
        "decile",
        "cum_n",
        "cum_k",
        "CAST(cum_k AS DOUBLE) / CAST(k AS DOUBLE) AS gain",
        "(CAST(cum_k AS DOUBLE) / CAST(k AS DOUBLE))"
        " / (CAST(cum_n AS DOUBLE) / CAST(n AS DOUBLE)) AS lift",
    )
