"""Causal-inference tier: the two workhorse quasi-experimental
estimators every analytics platform ends up shipping, plus a
rank-fusion consensus for source selection:

- did_segment_revenue     difference-in-differences of order value,
                          BUILDING (treated) vs MACHINERY (control),
                          pre/post a fixed cutover date — the
                          first-line "did the change do anything"
                          estimator when randomization isn't available
- stratified_ate_priority subclassification ATE of urgent-priority
                          handling on order value, stratified by
                          customer segment — the confounder-adjusted
                          twin of a raw treated-vs-control mean gap
- borda_source_ranking    Borda-count consensus over three per-source
                          quality rankings (volume, diversity, doc
                          length) — the multi-metric source selector
                          (rrf_fused_retrieval's corpus-side sibling)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.portable import (
    apply_stages,
    pnorm_stages,
    sql_wrap_stages,
)
from tvbigdataproject_spark.queries._stable import (
    dec_to_double_wide,
    sql_huge_to_double_wide,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# ---------------------------------------------------------------- Q49

_DID_T = "BUILDING"  # the suite's fixed two-sample design (analytic6)
_DID_C = "MACHINERY"
_DID_CUT = "1998-01-01"  # orders span 1995..2001; the cut splits ~half

# the four cells pivot to one row: g in {t,c} x p in {pre,post}. Every
# mean/variance is an identically-spelled IEEE expression of exact
# integer sums; the SE sums the FOUR variance terms left-to-right
# (fixed-order-pivot convention — a float SUM over rows would be
# addition-order-dependent).
_DID_CELLS = ("t_pre", "t_post", "c_pre", "c_post")


def _did_mean(cell: str) -> str:
    return f"(CAST(s_{cell} AS DOUBLE) / CAST(n_{cell} AS DOUBLE))"


def _did_var_over_n(cell: str) -> str:
    # Var(ybar_cell) = (E[y^2] - E[y]^2) / n, population variance
    return (
        f"((sq_{cell}_d / CAST(n_{cell} AS DOUBLE)"
        f" - {_did_mean(cell)} * {_did_mean(cell)})"
        f" / CAST(n_{cell} AS DOUBLE))"
    )


_DID_EST = (
    f"(({_did_mean('t_post')} - {_did_mean('t_pre')})"
    f" - ({_did_mean('c_post')} - {_did_mean('c_pre')}))"
)
_DID_SE = (
    "sqrt((("
    + " + ".join(_did_var_over_n(c) for c in _DID_CELLS)
    + ")))"
)


def _did_sql() -> str:
    cells = f"""
    SELECT CASE WHEN c.c_mktsegment = '{_DID_T}' THEN 't' ELSE 'c' END
               AS grp,
           CASE WHEN o.o_orderdate >= TIMESTAMP '{_DID_CUT}'
                THEN 'post' ELSE 'pre' END AS period,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS s,
           SUM(CAST(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                    AS HUGEINT)
               * CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS sq
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment IN ('{_DID_T}', '{_DID_C}')
    GROUP BY 1, 2
    """
    piv_cols = ", ".join(
        f"MAX(CASE WHEN grp = '{g}' AND period = '{p}' THEN n END)"
        f" AS n_{g}_{p}, "
        f"MAX(CASE WHEN grp = '{g}' AND period = '{p}' THEN s END)"
        f" AS s_{g}_{p}, "
        f"{sql_huge_to_double_wide(_did_sq_case(g, p))} AS sq_{g}_{p}_d"
        for g, p in (("t", "pre"), ("t", "post"), ("c", "pre"), ("c", "post"))
    )
    piv = f"SELECT {piv_cols} FROM ({cells})"
    scored = sql_wrap_stages(
        f"""(SELECT *, {_DID_EST} AS did_cents, {_DID_SE} AS se_cents,
             ({_DID_EST}) / ({_DID_SE}) AS z
             FROM ({piv}))""",
        pnorm_stages("CAST(0 AS DOUBLE) - abs(z)", "_phi", "_dd_"),
    )
    return f"""
    SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
           {_did_mean('t_pre')} AS mean_t_pre,
           {_did_mean('t_post')} AS mean_t_post,
           {_did_mean('c_pre')} AS mean_c_pre,
           {_did_mean('c_post')} AS mean_c_post,
           did_cents, se_cents, z,
           CAST(2 AS DOUBLE) * _phi AS p_two_sided
    FROM {scored}
    """


def _did_sq_case(g: str, p: str) -> str:
    return (
        f"MAX(CASE WHEN grp = '{g}' AND period = '{p}' THEN sq END)"
    )


@query(
    "did_segment_revenue",
    sql=_did_sql(),
    tags=("analytics", "causal", "inference"),
)
def did_segment_revenue(spark, sf_dir):
    """Difference-in-differences of order value (cents): treated =
    {t} customers, control = {c}, pre/post {cut} — the parallel-trends
    estimator of "what changed for the treated beyond what changed for
    everyone": DiD = (post_T - pre_T) - (post_C - pre_C), with the
    large-sample SE sqrt(sum of var_g/n_g over the 4 cells) and the
    two-sided normal p-value via the portable CDF.

    Exactness: cell sums are exact BIGINT cents and squared sums exact
    128-bit integers through the agreed split-cast; the 2x2 design
    pivots to one row so the SE's four-term sum is fixed-order; DiD,
    SE, z, p are identically-spelled IEEE expressions.

    Scale shape: one join + one map-side-combined aggregate to a 4-row
    cell table; everything after is a single-row pivot.
    """
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .where(F.col("c_mktsegment").isin(_DID_T, _DID_C))
        .select(
            F.when(F.col("c_mktsegment") == _DID_T, F.lit("t"))
            .otherwise(F.lit("c"))
            .alias("grp"),
            F.when(
                F.col("o_orderdate") >= F.lit(_DID_CUT).cast("timestamp"),
                F.lit("post"),
            )
            .otherwise(F.lit("pre"))
            .alias("period"),
            cents.alias("x"),
        )
        .groupBy("grp", "period")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").cast("long").alias("s"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sq"),
        )
    )
    piv_exprs = []
    for g, p in (("t", "pre"), ("t", "post"), ("c", "pre"), ("c", "post")):
        cond = (F.col("grp") == g) & (F.col("period") == p)
        piv_exprs.append(F.max(F.when(cond, F.col("n"))).alias(f"n_{g}_{p}"))
        piv_exprs.append(F.max(F.when(cond, F.col("s"))).alias(f"s_{g}_{p}"))
        piv_exprs.append(
            dec_to_double_wide(
                F.max(F.when(cond, F.col("sq")))
            ).alias(f"sq_{g}_{p}_d")
        )
    piv = cells.agg(*piv_exprs)
    scored = piv.selectExpr(
        "*",
        f"{_DID_EST} AS did_cents",
        f"{_DID_SE} AS se_cents",
        f"({_DID_EST}) / ({_DID_SE}) AS z",
    )
    scored = apply_stages(
        scored, pnorm_stages("CAST(0 AS DOUBLE) - abs(z)", "_phi", "_dd_")
    )
    return scored.selectExpr(
        "n_t_pre",
        "n_t_post",
        "n_c_pre",
        "n_c_post",
        f"{_did_mean('t_pre')} AS mean_t_pre",
        f"{_did_mean('t_post')} AS mean_t_post",
        f"{_did_mean('c_pre')} AS mean_c_pre",
        f"{_did_mean('c_post')} AS mean_c_post",
        "did_cents",
        "se_cents",
        "z",
        "CAST(2 AS DOUBLE) * _phi AS p_two_sided",
    )


did_segment_revenue.__doc__ = did_segment_revenue.__doc__.format(
    t=_DID_T, c=_DID_C, cut=_DID_CUT
)


# ---------------------------------------------------------------- Q50

_ATE_SEGMENTS = (
    "AUTOMOBILE",
    "BUILDING",
    "FURNITURE",
    "HOUSEHOLD",
    "MACHINERY",
)
_ATE_TREAT = "1-URGENT"


def _ate_sql() -> str:
    strata = f"""
    SELECT c.c_mktsegment AS segment,
           CASE WHEN o.o_orderpriority = '{_ATE_TREAT}' THEN 1 ELSE 0 END
               AS treated,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS s
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    """
    wide = f"""
    SELECT segment,
           CAST(MAX(CASE WHEN treated = 1 THEN n END) AS BIGINT) AS n1,
           CAST(MAX(CASE WHEN treated = 1 THEN s END) AS BIGINT) AS s1,
           CAST(MAX(CASE WHEN treated = 0 THEN n END) AS BIGINT) AS n0,
           CAST(MAX(CASE WHEN treated = 0 THEN s END) AS BIGINT) AS s0
    FROM ({strata}) GROUP BY 1
    """
    diff = (
        "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
        " - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    )
    # fixed-order pivot of the 5 weighted stratum terms (the anova
    # convention): w_s = (n1+n0)/n_total, summed left-to-right
    terms = " + ".join(
        f"COALESCE(MAX(CASE WHEN segment = '{s}' THEN"
        f" CAST(n1 + n0 AS DOUBLE) * {diff} END),"
        " CAST(0 AS DOUBLE))"
        for s in _ATE_SEGMENTS
    )
    ate = f"""
    SELECT (({terms})) / CAST(SUM(n1 + n0) AS DOUBLE) AS ate_cents
    FROM ({wide})
    """
    return f"""
    SELECT segment, n1, n0,
           CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_treated,
           CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS mean_control,
           {diff} AS diff_cents,
           a.ate_cents
    FROM ({wide}) w CROSS JOIN ({ate}) a
    """


@query(
    "stratified_ate_priority",
    sql=_ate_sql(),
    tags=("analytics", "causal", "inference"),
)
def stratified_ate_priority(spark, sf_dir):
    """Subclassification (stratified) average treatment effect of
    urgent order priority on order value, stratified by customer
    segment: per-stratum treated/control means and their gap, plus the
    stratum-size-weighted ATE = sum_s w_s (ybar_1s - ybar_0s) attached
    to every row — the confounder-adjusted answer where a raw
    treated-vs-control gap would be confounded by segment mix.

    Exactness: all counts/sums exact integers; per-stratum means and
    gaps are single IEEE expressions; the ATE sums the FIXED 5-segment
    pivot left-to-right (fixed-order-pivot convention, anova class).

    Scale shape: one join + one map-side-combined aggregate to a
    10-row (segment x treated) table; the ATE is a single-row pivot
    attached back by broadcast.
    """
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    strata = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.when(F.col("o_orderpriority") == _ATE_TREAT, F.lit(1))
            .otherwise(F.lit(0))
            .alias("treated"),
            cents.alias("x"),
        )
        .groupBy("segment", "treated")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").cast("long").alias("s"),
        )
    )
    wide = strata.groupBy("segment").agg(
        F.max(F.when(F.col("treated") == 1, F.col("n")))
        .cast("long")
        .alias("n1"),
        F.max(F.when(F.col("treated") == 1, F.col("s")))
        .cast("long")
        .alias("s1"),
        F.max(F.when(F.col("treated") == 0, F.col("n")))
        .cast("long")
        .alias("n0"),
        F.max(F.when(F.col("treated") == 0, F.col("s")))
        .cast("long")
        .alias("s0"),
    )
    diff = (
        "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
        " - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    )
    term_cols = [
        F.expr(
            f"COALESCE(MAX(CASE WHEN segment = '{s}' THEN"
            f" CAST(n1 + n0 AS DOUBLE) * {diff} END),"
            " CAST(0 AS DOUBLE))"
        )
        for s in _ATE_SEGMENTS
    ]
    num = term_cols[0]
    for t in term_cols[1:]:
        num = num + t
    ate = wide.agg(
        (num / F.expr("CAST(SUM(n1 + n0) AS DOUBLE)")).alias("ate_cents")
    )
    return (
        wide.crossJoin(F.broadcast(ate))
        .selectExpr(
            "segment",
            "n1",
            "n0",
            "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_treated",
            "CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS mean_control",
            f"{diff} AS diff_cents",
            "ate_cents",
        )
    )


# ---------------------------------------------------------------- Q51


@query(
    "borda_source_ranking",
    sql="""
    WITH per AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types,
               CAST(SUM(nc) AS BIGINT) AS sum_chars,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM (
            SELECT doc_id, source, n_chars AS nc,
                   UNNEST(string_split(lower(text), ' ')) AS w
            FROM documents
        ) GROUP BY 1
    ),
    ranked AS (
        SELECT source, n_tokens, n_types, n_docs,
               ROW_NUMBER() OVER (ORDER BY n_tokens DESC, source)
                   AS r_volume,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(n_types AS DOUBLE)
                            / CAST(n_tokens AS DOUBLE) DESC, source)
                   AS r_diversity,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(sum_chars AS DOUBLE)
                            / CAST(n_docs AS DOUBLE) DESC, source)
                   AS r_doclen
        FROM per
    )
    SELECT source, r_volume, r_diversity, r_doclen,
           CAST(3 * (SELECT COUNT(*) FROM per)
                - r_volume - r_diversity - r_doclen AS BIGINT)
               AS borda_score,
           ROW_NUMBER() OVER (
               ORDER BY r_volume + r_diversity + r_doclen, source)
               AS consensus_rank
    FROM ranked
    """,
    tags=("llm", "profile", "ranking"),
)
def borda_source_ranking(spark, sf_dir):
    """Borda-count consensus ranking of sources over three quality
    rankings — token volume, type/token diversity, mean document
    length — the multi-metric source selector a mixing policy reads
    when no single metric should dominate (rrf_fused_retrieval is the
    per-query retrieval twin; this is the corpus-side version).

    Determinism: each metric ranking is total-ordered (metric, then
    source); the Borda score is pure integer arithmetic on the ranks.

    Scale shape: one token explode -> per-source aggregate (20 rows at
    any SF — sources are a bounded label domain); all three rank
    windows and the consensus window run unpartitioned over that
    bounded table only.
    """
    docs = read_table(spark, sf_dir, "documents")
    per = (
        docs.select(
            "doc_id",
            "source",
            F.col("n_chars").alias("nc"),
            F.explode(F.split(F.lower("text"), " ")).alias("w"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.countDistinct("w").cast("long").alias("n_types"),
            F.sum("nc").cast("long").alias("sum_chars"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
    )
    nsrc = per.agg(F.count(F.lit(1)).alias("n_sources"))
    ranked = per.selectExpr(
        "source",
        "n_tokens",
        "n_types",
        "n_docs",
        "sum_chars",
        "ROW_NUMBER() OVER (ORDER BY n_tokens DESC, source) AS r_volume",
        "ROW_NUMBER() OVER (ORDER BY CAST(n_types AS DOUBLE)"
        " / CAST(n_tokens AS DOUBLE) DESC, source) AS r_diversity",
        "ROW_NUMBER() OVER (ORDER BY CAST(sum_chars AS DOUBLE)"
        " / CAST(n_docs AS DOUBLE) DESC, source) AS r_doclen",
    )
    return (
        ranked.crossJoin(F.broadcast(nsrc))
        .selectExpr(
            "source",
            "r_volume",
            "r_diversity",
            "r_doclen",
            "CAST(3 * n_sources - r_volume - r_diversity - r_doclen"
            " AS BIGINT) AS borda_score",
            "ROW_NUMBER() OVER (ORDER BY r_volume + r_diversity"
            " + r_doclen, source) AS consensus_rank",
        )
    )
