"""Analytics batch 20 (r12): the EDF-test family completed and effect
sizes the inference tier reports beside its p-values —

- anderson_darling_doclen  two-sample Anderson-Darling distance
                           (en vs zh doc lengths) — the tail-weighted
                           member of the KS/CvM family: the
                           1/(F(1-F)) weight makes AD the most
                           powerful of the three against tail drift,
                           exactly where corpus contamination shows up
- rank_biserial_mwu        rank-biserial correlation r = 1 - 2U/(n1*n2)
                           — Mann-Whitney's effect size (a p-value
                           says "real", r says "how big"; at corpus
                           row counts everything is "significant", so
                           the effect size is the decision number)
- cohens_d_segments        Cohen's d / Hedges' g standardized mean
                           difference between the same two segments —
                           the parametric effect size beside the
                           rank-based one
- odds_ratio_doclen_lang   2x2 odds ratio (long-document rate, en vs
                           zh) with the Woolf log-CI through the
                           portable ln/exp kernels — the
                           epidemiology-style association readout for
                           gate/slice dashboards

Exactness: all cell/rank/moment inputs are exact integers; logs and
exps ride the portable kernels; per-term doubles round once into
stable BIGINT sums (AD's weighted terms); remaining arithmetic is
shared-text.
"""

from __future__ import annotations

from pyspark.sql import Window
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
from tvbigdataproject_spark.queries.registry import REGISTRY, query
from tvbigdataproject_spark.sources import read_table

# ------------------------------------------------------------- Q401

_AD_SCALE = 10**9


@query(
    "anderson_darling_doclen",
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
               CAST(SUM(ca + cb) OVER (ORDER BY v) AS BIGINT) AS cumn
        FROM grid
    ),
    t AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
               CAST(SUM(ca + cb) AS BIGINT) AS nn
        FROM grid
    ),
    terms AS (
        SELECT CAST(ROUND(
                 {sql_huge_to_double_wide(
                     "(CAST(ca + cb AS DECIMAL(38,0))"
                     " * (CAST(cuma AS DECIMAL(38,0)) * t.nn"
                     "    - CAST(cumn AS DECIMAL(38,0)) * t.na)"
                     " * (CAST(cuma AS DECIMAL(38,0)) * t.nn"
                     "    - CAST(cumn AS DECIMAL(38,0)) * t.na))"
                 )}
                 / CAST(cumn AS DOUBLE) / CAST(t.nn - cumn AS DOUBLE)
                 * {_AD_SCALE}) AS BIGINT) AS c
        FROM cum CROSS JOIN t
        WHERE cumn < t.nn
    )
    SELECT t.na, t.nb,
           CAST(SUM(c) AS BIGINT) AS sum_scaled,
           CAST(SUM(c) AS DOUBLE) / {_AD_SCALE}
               / CAST(t.na AS DOUBLE) / CAST(t.nb AS DOUBLE)
               AS ad_a2
    FROM terms CROSS JOIN t
    GROUP BY t.na, t.nb
    """,
    tags=("analytics", "stats", "distribution-test"),
)
def anderson_darling_doclen(spark, sf_dir):
    """Two-sample Anderson-Darling statistic between en and zh
    document lengths: A2 = (1/(na*nb)) * sum over pooled points
    (below the top) of l_v * (M_v*N - B_v*na)^2 / (B_v * (N - B_v)) —
    the tail-weighted completion of the EDF family (KS = worst gap,
    CvM = integrated gap, AD = integrated gap with 1/(F(1-F)) weight,
    which is what detects contamination living in the tails).
    Right-continuous tie handling is the declared estimator (each
    distinct value contributes at its upper CDF step, multiplicity-
    weighted; the Scholz-Stephens midpoint variant differs only in
    the tie correction).

    Exactness: every gap is the exact cross-multiplied decimal
    M_v*N - B_v*na (the KS discipline); each value's weighted term is
    one wide-cast + two shared-text divisions rounded ONCE at 1e9,
    summed as exact BIGINTs.

    Scale shape: identical to ks/cvm_doclen_lang — two filtered
    aggregates onto the bounded length grid, one cumulative window,
    one bounded total.
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
        F.sum(F.col("ca") + F.col("cb")).over(w).cast("long").alias("cumn"),
    )
    t = grid.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.sum(F.col("ca") + F.col("cb")).cast("long").alias("nn"),
    )
    gap = (
        F.col("cuma").cast("decimal(38,0)") * F.col("nn")
        - F.col("cumn").cast("decimal(38,0)") * F.col("na")
    )
    g2 = (
        (F.col("ca") + F.col("cb")).cast("decimal(38,0)") * gap * gap
    ).cast("decimal(38,0)")
    terms = (
        cum.crossJoin(F.broadcast(t))
        .where(F.col("cumn") < F.col("nn"))
        .select(
            F.round(
                dec_to_double_wide(g2)
                / F.col("cumn").cast("double")
                / (F.col("nn") - F.col("cumn")).cast("double")
                * _AD_SCALE
            )
            .cast("long")
            .alias("c"),
            "na",
            "nb",
        )
    )
    return terms.groupBy("na", "nb").agg(
        F.sum("c").cast("long").alias("sum_scaled"),
        (
            F.sum("c").cast("double")
            / _AD_SCALE
            / F.col("na").cast("double")
            / F.col("nb").cast("double")
        ).alias("ad_a2"),
    ).select("na", "nb", "sum_scaled", "ad_a2")


# ------------------------------------------------------------- Q402


def _rb_sql() -> str:
    base = REGISTRY["mann_whitney_u"].sql
    return f"""
    SELECT n1, n2, u1,
           CAST(1 AS DOUBLE)
               - CAST(u1_doubled AS DOUBLE)
                 / CAST(n1 * n2 AS DOUBLE) AS rank_biserial
    FROM ({base})
    """


@query(
    "rank_biserial_mwu",
    sql=_rb_sql(),
    tags=("analytics", "stats", "effect-size"),
)
def rank_biserial_mwu(spark, sf_dir):
    """Rank-biserial correlation for mann_whitney_u's segment
    comparison: r = 1 - 2*U1/(n1*n2) in [-1, 1] — the effect size the
    rank test should always ship with its p-value (at corpus row
    counts every difference is "significant"; r is the magnitude that
    decides whether anyone should care; r = 0 means stochastic
    equality).

    Exactness: rides mann_whitney_u's doubled-rank integers verbatim
    (u1_doubled is exact, so 2*U1 = u1_doubled needs no halving);
    r is one shared-text division.

    Scale shape: the MWU bounded-bucket ranking (no global data
    window) plus constant arithmetic.
    """
    base = REGISTRY["mann_whitney_u"].fn(spark, sf_dir)
    return base.selectExpr(
        "n1",
        "n2",
        "u1",
        "CAST(1 AS DOUBLE) - CAST(u1_doubled AS DOUBLE)"
        " / CAST(n1 * n2 AS DOUBLE) AS rank_biserial",
    )


# ------------------------------------------------------------- Q403

_CD_A = "BUILDING"
_CD_B = "MACHINERY"


@query(
    "cohens_d_segments",
    sql=f"""
    WITH m AS (
        SELECT CASE WHEN c_mktsegment = '{_CD_A}' THEN 1 ELSE 0 END AS ia,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
                        * CAST(ROUND(c_acctbal * 100) AS BIGINT))
                    AS DECIMAL(38,0)) AS ss
        FROM customer
        WHERE c_mktsegment IN ('{_CD_A}', '{_CD_B}')
        GROUP BY 1
    ),
    w AS (
        SELECT MAX(CASE WHEN ia = 1 THEN n END) AS n1,
               MAX(CASE WHEN ia = 0 THEN n END) AS n2,
               MAX(CASE WHEN ia = 1 THEN CAST(s AS DOUBLE) / n / 100.0 END)
                   AS m1,
               MAX(CASE WHEN ia = 0 THEN CAST(s AS DOUBLE) / n / 100.0 END)
                   AS m2,
               MAX(CASE WHEN ia = 1 THEN {sql_huge_to_double_wide(
                   '(CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s)'
               )} / CAST(n AS DOUBLE) / 10000.0 END) AS q1,
               MAX(CASE WHEN ia = 0 THEN {sql_huge_to_double_wide(
                   '(CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s)'
               )} / CAST(n AS DOUBLE) / 10000.0 END) AS q2
        FROM m
    )
    SELECT n1, n2, m1, m2,
           (m1 - m2) / sqrt((q1 + q2) / CAST(n1 + n2 - 2 AS DOUBLE))
               AS cohens_d,
           (m1 - m2) / sqrt((q1 + q2) / CAST(n1 + n2 - 2 AS DOUBLE))
               * (CAST(1 AS DOUBLE) - CAST(3 AS DOUBLE)
                  / CAST(4 * (n1 + n2) - 9 AS DOUBLE)) AS hedges_g
    FROM w
    """,
    tags=("analytics", "stats", "effect-size"),
)
def cohens_d_segments(spark, sf_dir):
    """Cohen's d (and the small-sample Hedges' g correction) between
    the {a} and {b} segments on account balance: (m1 - m2) / s_pooled
    — the parametric effect size beside rank_biserial_mwu; the
    pooled-SD denominator uses the n-1-free sum-of-squares identity
    q = (n*ss - s^2)/n so d's denominator is sqrt((q1+q2)/(n1+n2-2)),
    the textbook pooled estimator.

    Exactness: per-group moments are exact integer/decimal sums; each
    group's q is one wide-cast + shared-text divisions; d and g are
    shared-text doubles with IEEE sqrt.

    Scale shape: ONE filtered customer scan producing a 2-row moment
    table (map-side partial aggregation), then constant arithmetic.
    """
    cust = read_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin(_CD_A, _CD_B)
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    m = cust.groupBy(
        F.when(F.col("c_mktsegment") == _CD_A, 1).otherwise(0).alias("ia")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents).cast("long").alias("s"),
        F.sum(cents.cast("decimal(38,0)") * cents)
        .cast("decimal(38,0)")
        .alias("ss"),
    )
    q = dec_to_double_wide(
        (
            F.col("n").cast("decimal(38,0)") * F.col("ss")
            - F.col("s").cast("decimal(38,0)") * F.col("s")
        ).cast("decimal(38,0)")
    ) / F.col("n").cast("double") / F.lit(10000.0)
    w = m.agg(
        F.max(F.when(F.col("ia") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("ia") == 0, F.col("n"))).alias("n2"),
        F.max(
            F.when(
                F.col("ia") == 1,
                F.col("s").cast("double") / F.col("n") / 100.0,
            )
        ).alias("m1"),
        F.max(
            F.when(
                F.col("ia") == 0,
                F.col("s").cast("double") / F.col("n") / 100.0,
            )
        ).alias("m2"),
        F.max(F.when(F.col("ia") == 1, q)).alias("q1"),
        F.max(F.when(F.col("ia") == 0, q)).alias("q2"),
    )
    d = (F.col("m1") - F.col("m2")) / F.sqrt(
        (F.col("q1") + F.col("q2"))
        / (F.col("n1") + F.col("n2") - 2).cast("double")
    )
    return w.select(
        "n1",
        "n2",
        "m1",
        "m2",
        d.alias("cohens_d"),
        (
            d
            * (
                F.lit(1.0)
                - F.lit(3.0)
                / (4 * (F.col("n1") + F.col("n2")) - 9).cast("double")
            )
        ).alias("hedges_g"),
    )


cohens_d_segments.__doc__ = cohens_d_segments.__doc__.format(
    a=_CD_A, b=_CD_B
)


# ------------------------------------------------------------- Q404

_OR_LONG = 300  # "long document" threshold (chars)
_OR_Z = "CAST(1.959963984540054 AS DOUBLE)"  # Phi^-1(0.975) literal


def _or_sql() -> str:
    cells = f"""
    SELECT CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= {_OR_LONG}
                    THEN 1 ELSE 0 END) AS BIGINT) AS a,
           CAST(SUM(CASE WHEN lang = 'en' AND n_chars < {_OR_LONG}
                    THEN 1 ELSE 0 END) AS BIGINT) AS b,
           CAST(SUM(CASE WHEN lang = 'zh' AND n_chars >= {_OR_LONG}
                    THEN 1 ELSE 0 END) AS BIGINT) AS c,
           CAST(SUM(CASE WHEN lang = 'zh' AND n_chars < {_OR_LONG}
                    THEN 1 ELSE 0 END) AS BIGINT) AS d
    FROM documents WHERE lang IN ('en', 'zh')
    """
    body = f"(SELECT a, b, c, d FROM ({cells}))"
    body = sql_wrap_stages(body, plog_stages("a * d", "_lad", "_o1_"))
    body = sql_wrap_stages(body, plog_stages("b * c", "_lbc", "_o2_"))
    se = (
        "sqrt(CAST(1 AS DOUBLE) / a + CAST(1 AS DOUBLE) / b"
        " + CAST(1 AS DOUBLE) / c + CAST(1 AS DOUBLE) / d)"
    )
    body = f"""
    (SELECT *, _lad - _lbc AS ln_or, {se} AS se_ln_or FROM {body})
    """
    body = sql_wrap_stages(
        body, pexp_stages(f"ln_or - {_OR_Z} * se_ln_or", "ci_lo", "_o3_")
    )
    body = sql_wrap_stages(
        body, pexp_stages(f"ln_or + {_OR_Z} * se_ln_or", "ci_hi", "_o4_")
    )
    return f"""
    SELECT a, b, c, d,
           CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE) AS odds_ratio,
           ln_or, se_ln_or, ci_lo, ci_hi
    FROM {body}
    """


@query(
    "odds_ratio_doclen_lang",
    sql=_or_sql(),
    tags=("analytics", "stats", "inference"),
)
def odds_ratio_doclen_lang(spark, sf_dir):
    """2x2 odds ratio of being a long document (>= {t} chars) for en
    vs zh, with the Woolf 95% CI: OR = ad/bc, ln OR +/- z*sqrt(1/a +
    1/b + 1/c + 1/d) — the association readout every gate/slice
    dashboard reports (chi2/cramers_v say "associated"; OR says "en
    docs have X times the odds", with a CI that honestly covers 1
    when the association is noise).

    Exactness: the four cells are exact integers from one filtered
    scan; ln(ad) and ln(bc) ride the portable log kernel on INTEGER
    products; the CI endpoints exponentiate through the portable exp
    kernel; z is a fixed double literal.

    Scale shape: one scan -> 1-row cell vector (map-side combined),
    then constant-size kernel arithmetic.
    """
    docs = read_table(spark, sf_dir, "documents").where(
        F.col("lang").isin("en", "zh")
    )
    cells = docs.agg(
        F.sum(
            F.when(
                (F.col("lang") == "en") & (F.col("n_chars") >= _OR_LONG), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("a"),
        F.sum(
            F.when(
                (F.col("lang") == "en") & (F.col("n_chars") < _OR_LONG), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("b"),
        F.sum(
            F.when(
                (F.col("lang") == "zh") & (F.col("n_chars") >= _OR_LONG), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("c"),
        F.sum(
            F.when(
                (F.col("lang") == "zh") & (F.col("n_chars") < _OR_LONG), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("d"),
    )
    body = apply_stages(cells, plog_stages("a * d", "_lad", "_o1_"))
    body = apply_stages(body, plog_stages("b * c", "_lbc", "_o2_"))
    body = body.selectExpr(
        "*",
        "_lad - _lbc AS ln_or",
        "sqrt(CAST(1 AS DOUBLE) / a + CAST(1 AS DOUBLE) / b"
        " + CAST(1 AS DOUBLE) / c + CAST(1 AS DOUBLE) / d) AS se_ln_or",
    )
    body = apply_stages(
        body, pexp_stages(f"ln_or - {_OR_Z} * se_ln_or", "ci_lo", "_o3_")
    )
    body = apply_stages(
        body, pexp_stages(f"ln_or + {_OR_Z} * se_ln_or", "ci_hi", "_o4_")
    )
    return body.selectExpr(
        "a",
        "b",
        "c",
        "d",
        "CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE) AS odds_ratio",
        "ln_or",
        "se_ln_or",
        "ci_lo",
        "ci_hi",
    )


odds_ratio_doclen_lang.__doc__ = odds_ratio_doclen_lang.__doc__.format(
    t=_OR_LONG
)
