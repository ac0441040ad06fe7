"""The p-value tier: significance levels for the suite's test
statistics, composed ON TOP of the existing statistic queries (same
DataFrame, same oracle SQL, wrapped with portable-kernel stages).

Eight rounds of inference queries stopped at the statistic (z, U, D,
H) because every tail probability needs a transcendental CDF. The
portable kernel closes the gap three ways:
- normal tails via pnorm_stages (A&S 7.1.26 erf, abs err <= 1.5e-7 —
  documented approximation whose virtue is bit-reproducibility);
- the Kolmogorov limit law via kolmogorov_q_stages (portable exp +
  exact power chain, err < 1e-13 past the clamp);
- even-df chi-square survival in closed form (df = 4:
  e^{-x/2}(1 + x/2) — elementary, exact).

- ab_test_pvalue          two-sided p for the two-proportion z-test
- mann_whitney_pvalue     tie-corrected normal approximation for U
- ks_doclen_pvalue        asymptotic two-sample KS p (Kolmogorov Q)
- kruskal_wallis_pvalue   exact even-df chi-square survival for H
                          (df = k-1 = 4; NULL if k != 5)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.portable import (
    apply_stages,
    kolmogorov_q_stages,
    pexp_stages,
    pnorm_stages,
    sql_wrap_stages,
)
from tvbigdataproject_spark.queries.registry import REGISTRY, query
from tvbigdataproject_spark.sources import read_table

# ---------------------------------------------------------------- Q29


def _ab_sql() -> str:
    base = REGISTRY["ab_test_zscore"].sql
    body = sql_wrap_stages(
        f"({base})",
        pnorm_stages(
            "CAST(0 AS DOUBLE) - abs(z_score)", "_phi", "_ab_"
        ),
    )
    return f"""
    SELECT n0, k0, n1, k1, z_score,
           CAST(2 AS DOUBLE) * _phi AS p_two_sided
    FROM {body}
    """


@query(
    "ab_test_pvalue",
    sql=_ab_sql(),
    tags=("analytics", "experimentation", "inference"),
)
def ab_test_pvalue(spark, sf_dir):
    """Two-sided p-value for ab_test_zscore's two-proportion z-test:
    p = 2 Phi(-|z|) through the portable normal CDF — the number the
    experimentation readout actually gates a launch on. Composes ON
    the registered statistic query (same plan, same oracle) plus one
    scalar-stage tail evaluation; p is bitwise-equal across engines
    and accurate to the documented ~1.5e-7 of the erf approximation.
    """
    base = REGISTRY["ab_test_zscore"].fn(spark, sf_dir)
    out = apply_stages(
        base,
        pnorm_stages("CAST(0 AS DOUBLE) - abs(z_score)", "_phi", "_ab_"),
    )
    return out.selectExpr(
        "n0",
        "k0",
        "n1",
        "k1",
        "z_score",
        "CAST(2 AS DOUBLE) * _phi AS p_two_sided",
    )


# ---------------------------------------------------------------- Q30

_MW_A = "BUILDING"  # analytic6.py's fixed two-sample design
_MW_B = "MACHINERY"

from tvbigdataproject_spark.queries._stable import (  # noqa: E402
    sql_huge_to_double_wide,
)

# tie-corrected variance of U: (n1 n2 / 12) ((n+1) - t3t / (n (n-1)))
_MW_Z = (
    "(u1 - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(2 AS DOUBLE))"
    " / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(12 AS DOUBLE)"
    " * (CAST(n1 + n2 + 1 AS DOUBLE) - t3t_d"
    " / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))))"
)


def _mw_sql() -> str:
    base = REGISTRY["mann_whitney_u"].sql
    ties = f"""
    SELECT SUM(CAST(n_v AS HUGEINT) * n_v * n_v - n_v) AS t3t
    FROM (
        SELECT cents, COUNT(*) AS n_v FROM (
            SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
            FROM customer
            WHERE c_mktsegment IN ('{_MW_A}', '{_MW_B}')
        ) GROUP BY cents
    )
    """
    joined = f"""
    SELECT b.*, {sql_huge_to_double_wide('t.t3t')} AS t3t_d
    FROM ({base}) b CROSS JOIN ({ties}) t
    """
    body = sql_wrap_stages(
        f"(SELECT *, {_MW_Z} AS z FROM ({joined}))",
        pnorm_stages("CAST(0 AS DOUBLE) - abs(z)", "_phi", "_mw_"),
    )
    return f"""
    SELECT n1, n2, u1, z,
           CAST(2 AS DOUBLE) * _phi AS p_two_sided
    FROM {body}
    """


@query(
    "mann_whitney_pvalue",
    sql=_mw_sql(),
    tags=("analytics", "stats", "inference"),
)
def mann_whitney_pvalue(spark, sf_dir):
    """Tie-corrected normal-approximation p-value for mann_whitney_u:
    z = (U - n1 n2 / 2) / sqrt((n1 n2 / 12)((n+1) - sum(t^3 - t) /
    (n(n-1)))), p = 2 Phi(-|z|). The tie term lifts to 128-bit before
    the agreed wide-to-double cast (tie-block cubes overflow int64 at
    scale); no continuity correction (documented choice — both engines
    compute the identical estimator).

    Scale shape: the base statistic's bucket-decomposed plan plus one
    (value, count) aggregate for the tie sum and scalar tail stages.
    """
    base = REGISTRY["mann_whitney_u"].fn(spark, sf_dir)
    cust = read_table(spark, sf_dir, "customer")
    ties = (
        cust.where(F.col("c_mktsegment").isin(_MW_A, _MW_B))
        .select(
            F.round(F.col("c_acctbal") * 100).cast("long").alias("cents")
        )
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("n_v"))
        .agg(
            F.sum(
                F.col("n_v").cast("decimal(38,0)")
                * F.col("n_v")
                * F.col("n_v")
                - F.col("n_v")
            ).alias("t3t")
        )
    )
    from tvbigdataproject_spark.queries._stable import dec_to_double_wide

    joined = base.crossJoin(
        F.broadcast(ties.select(dec_to_double_wide(F.col("t3t")).alias("t3t_d")))
    )
    scored = joined.selectExpr("*", f"{_MW_Z} AS z")
    out = apply_stages(
        scored,
        pnorm_stages("CAST(0 AS DOUBLE) - abs(z)", "_phi", "_mw_"),
    )
    return out.selectExpr(
        "n1", "n2", "u1", "z", "CAST(2 AS DOUBLE) * _phi AS p_two_sided"
    )


# ---------------------------------------------------------------- Q31

# lambda = (sqrt(ne) + 0.12 + 0.11/sqrt(ne)) * D, ne = na*nb/(na+nb)
_KS_LAM = (
    "(sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
    " / CAST(na + nb AS DOUBLE)) + CAST(0.12 AS DOUBLE)"
    " + CAST(0.11 AS DOUBLE)"
    " / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
    " / CAST(na + nb AS DOUBLE))) * d"
)


def _ks_sql() -> str:
    base = REGISTRY["ks_doclen_lang"].sql
    body = sql_wrap_stages(
        f"(SELECT *, {_KS_LAM} AS lam FROM ({base}))",
        kolmogorov_q_stages("lam", "p_asymptotic", "_ks_"),
    )
    return f"SELECT na, nb, d, lam, p_asymptotic FROM {body}"


@query(
    "ks_doclen_pvalue",
    sql=_ks_sql(),
    tags=("analytics", "stats", "inference"),
)
def ks_doclen_pvalue(spark, sf_dir):
    """Asymptotic p-value for ks_doclen_lang's two-sample KS distance
    via the Kolmogorov limit law with the Stephens small-sample factor
    lambda = (sqrt(ne) + 0.12 + 0.11/sqrt(ne)) D — the number the
    drift test alarms on. Q(lambda) evaluates through the portable
    kernel's exact power-chain series (< 1e-13 truncation past the
    lambda = 0.3 clamp, where p is 1 to ~5e-5).
    """
    base = REGISTRY["ks_doclen_lang"].fn(spark, sf_dir)
    scored = base.selectExpr("*", f"{_KS_LAM} AS lam")
    out = apply_stages(
        scored, kolmogorov_q_stages("lam", "p_asymptotic", "_ks_")
    )
    return out.select("na", "nb", "d", "lam", "p_asymptotic")


# ---------------------------------------------------------------- Q32


def _kw_sql() -> str:
    base = REGISTRY["kruskal_wallis_value"].sql
    body = sql_wrap_stages(
        f"({base})",
        pexp_stages(
            "CAST(0 AS DOUBLE) - h_corrected / CAST(2 AS DOUBLE)",
            "_eh",
            "_kw_",
        ),
    )
    return f"""
    SELECT n, k, h_corrected,
           CASE WHEN k = 5 THEN
               _eh * (CAST(1 AS DOUBLE)
                      + h_corrected / CAST(2 AS DOUBLE))
           END AS p_value
    FROM {body}
    """


@query(
    "kruskal_wallis_pvalue",
    sql=_kw_sql(),
    tags=("analytics", "stats", "inference"),
)
def kruskal_wallis_pvalue(spark, sf_dir):
    """EXACT chi-square survival p-value for kruskal_wallis_value's
    tie-corrected H: with k = 5 event types, df = 4 is even, and the
    even-df chi-square tail has the elementary closed form
    P(X > h) = e^{-h/2} (1 + h/2) — one portable exp, two IEEE ops, no
    approximation beyond the chi-square limit itself. Guarded to NULL
    if the type domain ever isn't 5 (the closed form is df-specific).
    """
    base = REGISTRY["kruskal_wallis_value"].fn(spark, sf_dir)
    out = apply_stages(
        base,
        pexp_stages(
            "CAST(0 AS DOUBLE) - h_corrected / CAST(2 AS DOUBLE)",
            "_eh",
            "_kw_",
        ),
    )
    return out.selectExpr(
        "n",
        "k",
        "h_corrected",
        "CASE WHEN k = 5 THEN _eh * (CAST(1 AS DOUBLE)"
        " + h_corrected / CAST(2 AS DOUBLE)) END AS p_value",
    )
