"""Portable-ln batch 6: distribution-fitting and language-model
structure metrics.

- cross_entropy_lang_matrix  5x5 cross-entropy matrix between
                             per-language unigram LMs (add-one
                             smoothed) — the language-similarity grid
                             behind transfer/mixture decisions
- power_law_alpha_tokens     Zipf/power-law exponent by the discrete
                             MLE alpha = 1 + n / sum ln(x/(xmin-1/2))
                             (Clauset, Shalizi & Newman 2009) on token
                             frequencies
- ngram_entropy_ladder       H(w), H(w2|w1), H(w3|w1w2) — the
                             predictability ladder whose decay is the
                             corpus' compressibility signature
- lognormal_fit_by_segment   mu/sigma of ln(order value) + geometric
                             mean per segment — the fit heavy-tailed
                             monetary monitors should use instead of a
                             normal z-score
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.portable import (
    apply_stages,
    pexp_stages,
    plog_stages,
    sql_wrap_stages,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# ---------------------------------------------------------------- Q22


def _ce_sql() -> str:
    per = """
    SELECT a.lang_p, b.lang_q, a.cp, b.cq, ta.np, tb.nq, v.v
    FROM
        (SELECT lang AS lang_p, w, COUNT(*) AS cp FROM
            (SELECT lang, unnest(string_split(lower(text), ' ')) AS w
             FROM documents) GROUP BY 1, 2) a
        JOIN (SELECT lang AS lang_q, w, COUNT(*) AS cq FROM
            (SELECT lang, unnest(string_split(lower(text), ' ')) AS w
             FROM documents) GROUP BY 1, 2) b ON a.w = b.w
        JOIN (SELECT lang AS lang_p, COUNT(*) AS np FROM
            (SELECT lang, unnest(string_split(lower(text), ' ')) AS w
             FROM documents) GROUP BY 1) ta ON a.lang_p = ta.lang_p
        JOIN (SELECT lang AS lang_q, COUNT(*) AS nq FROM
            (SELECT lang, unnest(string_split(lower(text), ' ')) AS w
             FROM documents) GROUP BY 1) tb ON b.lang_q = tb.lang_q
        CROSS JOIN (SELECT COUNT(DISTINCT w) AS v FROM
            (SELECT unnest(string_split(lower(text), ' ')) AS w
             FROM documents)) v
    """
    for src, out, p in (
        ("cq + 1", "_lq", "_c1_"),
        ("nq + v", "_lnq", "_c2_"),
    ):
        per = sql_wrap_stages(per, plog_stages(src, out, p))
    term = "CAST(cp AS DOUBLE) / CAST(np AS DOUBLE) * (_lnq - _lq)"
    return f"""
    SELECT lang_p, lang_q,
           CAST(SUM(CAST(ROUND(({term}) * 1000000000) AS BIGINT))
                AS DOUBLE) / CAST(1000000000 AS DOUBLE) AS cross_ent
    FROM {per}
    GROUP BY 1, 2
    """


@query(
    "cross_entropy_lang_matrix",
    sql=_ce_sql(),
    tags=("llm", "infotheory", "lm"),
)
def cross_entropy_lang_matrix(spark, sf_dir):
    """The 5x5 cross-entropy matrix H(P_l1, Q_l2) between per-language
    unigram models (Q add-one smoothed over the corpus vocabulary) —
    the language-affinity grid read before deciding mixture ratios or
    transfer pairs (row minus its diagonal is the KL divergence; the
    diagonal itself is each language's smoothed self-entropy).

    Exactness: every term is p(w) * [ln(nq + V) - ln(cq + 1)] with
    both lns portable on INTEGER arguments; tokens outside lang_p's
    support carry p = 0 and drop exactly, so the P-support inner join
    computes the full sum. Accumulation is the scaled-BIGINT stable
    sum per (lang_p, lang_q) cell.

    Scale shape: one (lang, token) aggregate self-joined on the token
    key (vocabulary-sized operands; the 5x fan-out is label
    cardinality, not data), broadcast totals, 25-row output.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    # totals and the vocabulary size derive from the (lang, token)
    # aggregate — one corpus explode (identical exchange plans once)
    lw = toks.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    nl = lw.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
    v = lw.agg(F.countDistinct("w").alias("v"))
    a = lw.selectExpr("lang AS lang_p", "w", "c AS cp")
    b = lw.selectExpr("lang AS lang_q", "w", "c AS cq")
    per = (
        a.join(b, "w")
        .join(
            F.broadcast(nl.selectExpr("lang AS lang_p", "n AS np")),
            "lang_p",
        )
        .join(
            F.broadcast(nl.selectExpr("lang AS lang_q", "n AS nq")),
            "lang_q",
        )
        .crossJoin(F.broadcast(v))
    )
    for src, out, p in (
        ("cq + 1", "_lq", "_c1_"),
        ("nq + v", "_lnq", "_c2_"),
    ):
        per = apply_stages(per, plog_stages(src, out, p))
    term = "CAST(cp AS DOUBLE) / CAST(np AS DOUBLE) * (_lnq - _lq)"
    return per.groupBy("lang_p", "lang_q").agg(
        F.expr(
            f"CAST(SUM(CAST(ROUND(({term}) * 1000000000) AS BIGINT))"
            " AS DOUBLE) / CAST(1000000000 AS DOUBLE)"
        ).alias("cross_ent")
    )


# ---------------------------------------------------------------- Q23

_PL_XMIN = 5
# ln(2*xmin - 1), the shared constant completing ln(x/(xmin - 1/2)) =
# ln(2x) - ln(2 xmin - 1); both engines round the same decimal to the
# same double
_PL_LDEN = f"CAST({math.log(2 * _PL_XMIN - 1)!r} AS DOUBLE)"

_PL_ALPHA = (
    "CAST(1 AS DOUBLE) + CAST(n AS DOUBLE)"
    " / (CAST(slx AS DOUBLE) / CAST(1000000000 AS DOUBLE)"
    f" - CAST(n AS DOUBLE) * {_PL_LDEN}) AS alpha_mle"
)


def _pl_sql() -> str:
    per = f"""
    SELECT x FROM (
        SELECT w, COUNT(*) AS x FROM
            (SELECT unnest(string_split(lower(text), ' ')) AS w
             FROM documents)
        GROUP BY w
    ) WHERE x >= {_PL_XMIN}
    """
    per = sql_wrap_stages(per, plog_stages("2 * x", "_lx", "_z1_"))
    return f"""
    SELECT n, {_PL_XMIN} AS xmin, {_PL_ALPHA} FROM (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(_lx * 1000000000) AS BIGINT))
                    AS BIGINT) AS slx
        FROM {per}
    )
    """


@query(
    "power_law_alpha_tokens",
    sql=_pl_sql(),
    tags=("llm", "infotheory", "textstats"),
)
def power_law_alpha_tokens(spark, sf_dir):
    """Power-law exponent of the token-frequency distribution by the
    discrete MLE alpha = 1 + n / sum ln(x_i / (xmin - 1/2)) (Clauset,
    Shalizi & Newman 2009) over frequencies >= {xmin} — the one-number
    Zipf summary complementing zipf_band_mass's full curve (alpha
    drifting down = the corpus is getting more repetitive).

    Exactness: ln(x/(xmin - 1/2)) = ln(2x) - ln(2 xmin - 1); the first
    is portable on the INTEGER 2x, the second a fixed shared decimal
    constant; the sum accumulates as scaled BIGINTs and the MLE is one
    identically-spelled expression over two exact aggregates.

    Scale shape: one vocabulary aggregate + a single-row reduce.
    """
    docs = read_table(spark, sf_dir, "documents")
    per = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("x"))
        .where(F.col("x") >= _PL_XMIN)
        .select("x")
    )
    per = apply_stages(per, plog_stages("2 * x", "_lx", "_z1_"))
    s = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(ROUND(_lx * 1000000000) AS BIGINT)"))
        .cast("long")
        .alias("slx"),
    )
    return s.selectExpr("n", f"{_PL_XMIN} AS xmin", _PL_ALPHA)


power_law_alpha_tokens.__doc__ = power_law_alpha_tokens.__doc__.format(
    xmin=_PL_XMIN
)


# ---------------------------------------------------------------- Q24

# conditional entropy per order k from (prefix, gram) instance counts:
# H_k = (sum_pfx pc ln pc - sum_gram c ln c) / N_k; for k = 1 the
# prefix is the empty string, making P_1 = N ln N — the same formula
# yields the plain unigram entropy.
_NG_ORDERS = (1, 2, 3)


def _ng_leg_sql(k: int) -> str:
    gram = " || ' ' || ".join(f"t[i + {j}]" for j in range(k))
    pfx = (
        " || ' ' || ".join(f"t[i + {j}]" for j in range(k - 1))
        if k > 1
        else "''"
    )
    inst = f"""
    SELECT {pfx} AS pfx, {gram} AS g
    FROM (SELECT string_split(lower(text), ' ') AS t FROM documents),
         UNNEST(range(1, len(t) - {k} + 2)) AS u(i)
    WHERE len(t) >= {k}
    """
    cnt = sql_wrap_stages(
        f"SELECT pfx, g, COUNT(*) AS c FROM ({inst}) GROUP BY 1, 2",
        plog_stages("c", "_lc", f"_n{k}a_"),
    )
    pc = sql_wrap_stages(
        f"SELECT pfx, COUNT(*) AS pc FROM ({inst}) GROUP BY 1",
        plog_stages("pc", "_lp", f"_n{k}b_"),
    )
    return f"""
    SELECT {k} AS k_order, cg.n_grams, cg.n_types,
           (CAST(pg.p_s AS DOUBLE) - CAST(cg.s_s AS DOUBLE))
               / CAST(1000000 AS DOUBLE) / CAST(cg.n_grams AS DOUBLE)
               AS h_cond_nats
    FROM
        (SELECT CAST(SUM(c) AS BIGINT) AS n_grams,
                COUNT(*) AS n_types,
                CAST(SUM(CAST(ROUND(c * _lc * 1000000) AS BIGINT))
                     AS BIGINT) AS s_s
         FROM {cnt}) cg
    CROSS JOIN
        (SELECT CAST(SUM(CAST(ROUND(pc * _lp * 1000000) AS BIGINT))
                     AS BIGINT) AS p_s
         FROM {pc}) pg
    """


@query(
    "ngram_entropy_ladder",
    sql=" UNION ALL ".join(f"({_ng_leg_sql(k)})" for k in _NG_ORDERS),
    tags=("llm", "infotheory", "ngram"),
)
def ngram_entropy_ladder(spark, sf_dir):
    """The conditional-entropy ladder H(w), H(w2|w1), H(w3|w1,w2) of
    the corpus under MLE n-gram models — the predictability profile
    whose decay rate is the corpus' compressibility signature (flat =
    incompressible noise; a steep drop to near zero at order 2 = the
    templated/boilerplate corpus every dedup pass hunts).

    Exactness: H_k = (sum pc ln pc - sum c ln c) / N_k over the
    (prefix, gram) count tables (for k = 1 the empty prefix makes the
    first term N ln N, recovering plain entropy); every ln portable on
    an INTEGER count, every sum a scaled BIGINT.

    Scale shape: per order, one gram aggregate and one prefix
    aggregate (map-side combined, vocabulary-sized results); the three
    legs union 1-row tables.
    """
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(F.split(F.lower("text"), " ").alias("t"))
    legs = []
    for k in _NG_ORDERS:
        inst = (
            t.where(F.size("t") >= k)
            .select(
                F.explode(
                    F.expr(
                        f"transform(sequence(1, size(t) - {k} + 1),"
                        f" i -> struct("
                        + (
                            f"concat_ws(' ', slice(t, i, {k - 1}))"
                            if k > 1
                            else "''"
                        )
                        + " AS pfx,"
                        f" concat_ws(' ', slice(t, i, {k})) AS g))"
                    )
                ).alias("z")
            )
            .select(F.col("z.pfx").alias("pfx"), F.col("z.g").alias("g"))
        )
        cnt = inst.groupBy("pfx", "g").agg(F.count(F.lit(1)).alias("c"))
        cnt = apply_stages(cnt, plog_stages("c", "_lc", f"_n{k}a_"))
        cg = cnt.agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(
                F.expr("CAST(ROUND(c * _lc * 1000000) AS BIGINT)")
            )
            .cast("long")
            .alias("s_s"),
        )
        # prefix counts derive from the gram-type aggregate (sum of c
        # over the suffix) — one corpus explode per order, not two
        pcd = cnt.groupBy("pfx").agg(F.sum("c").cast("long").alias("pc"))
        pcd = apply_stages(pcd, plog_stages("pc", "_lp", f"_n{k}b_"))
        pg = pcd.agg(
            F.sum(
                F.expr("CAST(ROUND(pc * _lp * 1000000) AS BIGINT)")
            )
            .cast("long")
            .alias("p_s")
        )
        leg = cg.crossJoin(F.broadcast(pg)).selectExpr(
            f"{k} AS k_order",
            "n_grams",
            "n_types",
            "(CAST(p_s AS DOUBLE) - CAST(s_s AS DOUBLE))"
            " / CAST(1000000 AS DOUBLE) / CAST(n_grams AS DOUBLE)"
            " AS h_cond_nats",
        )
        legs.append(leg)
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


# ---------------------------------------------------------------- Q25


def _ln_sql() -> str:
    per = """
    SELECT c.c_mktsegment AS segment,
           CAST(ROUND(o.o_totalprice) AS BIGINT) AS x
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """
    per = sql_wrap_stages(f"({per})", plog_stages("x", "_lx", "_l1_"))
    agg = f"""
    SELECT segment, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(_lx * 1000000000) AS BIGINT)) AS BIGINT)
               AS s1,
           CAST(SUM(CAST(ROUND(_lx * _lx * 1000000000) AS BIGINT))
                AS BIGINT) AS s2
    FROM {per} GROUP BY 1
    """
    mu = (
        "CAST(s1 AS DOUBLE) / CAST(1000000000 AS DOUBLE)"
        " / CAST(n AS DOUBLE)"
    )
    var = (
        "CAST(s2 AS DOUBLE) / CAST(1000000000 AS DOUBLE)"
        f" / CAST(n AS DOUBLE) - ({mu}) * ({mu})"
    )
    body = f"""
    SELECT segment, n, {mu} AS mu_ln, sqrt({var}) AS sigma_ln
    FROM ({agg})
    """
    body = sql_wrap_stages(f"({body})", pexp_stages("mu_ln", "geo_mean", "_l2_"))
    return f"SELECT segment, n, mu_ln, sigma_ln, geo_mean FROM {body}"


@query(
    "lognormal_fit_by_segment",
    sql=_ln_sql(),
    tags=("analytics", "stats", "infotheory"),
)
def lognormal_fit_by_segment(spark, sf_dir):
    """Lognormal fit of order value per customer segment: mu and sigma
    of ln(x) plus the geometric mean exp(mu) — the right location/
    scale pair for multiplicative monetary data (a normal z-score on
    heavy-tailed spend flags whales as anomalies; the lognormal fit is
    what dow_seasonal_anomaly-style monitors should threshold on).

    Exactness: ln(x) is the portable kernel on INTEGER whole-dollar
    values; first and second moments of ln(x) accumulate as scaled
    BIGINTs (per-row rounding of bitwise-identical doubles), and
    exp(mu) goes through the portable exp kernel. sigma uses the
    population variance of the ROUNDED lns — a fixed, documented
    estimator, identical in both engines.

    Scale shape: one join + one map-side-combined aggregate to 5 rows.
    """
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    per = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("o_totalprice")).cast("long").alias("x"),
    )
    per = apply_stages(per, plog_stages("x", "_lx", "_l1_"))
    agg = per.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(ROUND(_lx * 1000000000) AS BIGINT)"))
        .cast("long")
        .alias("s1"),
        F.sum(F.expr("CAST(ROUND(_lx * _lx * 1000000000) AS BIGINT)"))
        .cast("long")
        .alias("s2"),
    )
    mu = (
        "CAST(s1 AS DOUBLE) / CAST(1000000000 AS DOUBLE)"
        " / CAST(n AS DOUBLE)"
    )
    var = (
        "CAST(s2 AS DOUBLE) / CAST(1000000000 AS DOUBLE)"
        f" / CAST(n AS DOUBLE) - ({mu}) * ({mu})"
    )
    body = agg.selectExpr(
        "segment", "n", f"{mu} AS mu_ln", f"sqrt({var}) AS sigma_ln"
    )
    body = apply_stages(body, pexp_stages("mu_ln", "geo_mean", "_l2_"))
    return body.select("segment", "n", "mu_ln", "sigma_ln", "geo_mean")
