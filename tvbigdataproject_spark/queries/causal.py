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


# ---------------------------------------------------------------- Q53

_CU_T = "BUILDING"
_CU_C = "MACHINERY"
_CU_CUT = "1998-01-01"

# per-customer pre/post spend (cents); theta fitted POOLED:
# theta = cov(x, y) / var(x) = (n sxy - sx sy) / (n sxx - sx^2),
# every cross product lifted to 128 bits. The 2-group pivot makes all
# global sums fixed-order (t + c, left to right).
_CU_NUM = "(nd * sxy_d - sx_d * sy_d)"
_CU_DEN = "(nd * sxx_d - sx_d * sx_d)"
_CU_THETA = f"({_CU_NUM} / {_CU_DEN})"


def _cu_cell(g: str, col: str) -> str:
    return f"MAX(CASE WHEN grp = '{g}' THEN {col} END)"


def _cuped_sql() -> str:
    per = f"""
    SELECT c.c_custkey AS cust,
           CASE WHEN c.c_mktsegment = '{_CU_T}' THEN 't' ELSE 'c' END
               AS grp,
           CAST(SUM(CASE WHEN o.o_orderdate < TIMESTAMP '{_CU_CUT}'
                THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS x,
           CAST(SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '{_CU_CUT}'
                THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS y
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment IN ('{_CU_T}', '{_CU_C}')
    GROUP BY 1, 2
    """
    g = f"""
    SELECT grp, COUNT(*) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           SUM(CAST(x AS HUGEINT) * x) AS sxx,
           SUM(CAST(x AS HUGEINT) * y) AS sxy
    FROM ({per}) GROUP BY 1
    """
    piv = f"""
    SELECT {_cu_cell('t', 'n')} AS n_t, {_cu_cell('c', 'n')} AS n_c,
           {_cu_cell('t', 'sx')} AS sx_t, {_cu_cell('c', 'sx')} AS sx_c,
           {_cu_cell('t', 'sy')} AS sy_t, {_cu_cell('c', 'sy')} AS sy_c,
           {sql_huge_to_double_wide(_cu_cell('t', 'sxx')
               + ' + ' + _cu_cell('c', 'sxx'))} AS sxx_d,
           {sql_huge_to_double_wide(_cu_cell('t', 'sxy')
               + ' + ' + _cu_cell('c', 'sxy'))} AS sxy_d
    FROM ({g})
    """
    scored = f"""
    SELECT n_t, n_c,
           CAST(n_t + n_c AS DOUBLE) AS nd,
           CAST(sx_t + sx_c AS DOUBLE) AS sx_d,
           CAST(sy_t + sy_c AS DOUBLE) AS sy_d,
           sxx_d, sxy_d,
           CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)
               - CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS diff_raw,
           CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE)
               - CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS diff_x
    FROM ({piv})
    """
    return f"""
    SELECT n_t, n_c, diff_raw,
           {_CU_THETA} AS theta,
           diff_raw - {_CU_THETA} * diff_x AS diff_cuped
    FROM ({scored})
    """


@query(
    "cuped_adjusted_ab",
    sql=_cuped_sql(),
    tags=("analytics", "causal", "experiment"),
)
def cuped_adjusted_ab(spark, sf_dir):
    """CUPED-adjusted two-group comparison of post-period customer
    spend ({t} vs {c}, cut at {cut}): the raw mean difference, the
    pooled pre-period regression coefficient theta = cov(x,y)/var(x),
    and the adjusted difference diff - theta * (pre-period imbalance) —
    the industry-standard experiment variance-reduction (Deng et al.
    2013's controlled-experiment covariate adjustment): pre-period
    spend soaks up between-customer variance AND corrects the
    pre-existing imbalance a naive diff would misread as effect.

    Exactness: per-customer pre/post cents are exact BIGINTs; group
    cross-moments lift to 128 bits through the agreed split-cast and
    pool by the fixed-order two-group pivot; theta and both diffs are
    identically-spelled IEEE expressions.

    Scale shape: one join + per-customer aggregate (map-side combined),
    then a 2-row group reduce and a single-row pivot.
    """
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cut = F.lit(_CU_CUT).cast("timestamp")
    per = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .where(F.col("c_mktsegment").isin(_CU_T, _CU_C))
        .groupBy(
            F.col("c_custkey").alias("cust"),
            F.when(F.col("c_mktsegment") == _CU_T, F.lit("t"))
            .otherwise(F.lit("c"))
            .alias("grp"),
        )
        .agg(
            F.sum(
                F.when(F.col("o_orderdate") < cut, cents).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(F.col("o_orderdate") >= cut, cents).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("y"),
        )
    )
    g = per.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
    )

    def cell(grp, col):
        return F.max(F.when(F.col("grp") == grp, F.col(col)))

    piv = g.agg(
        cell("t", "n").alias("n_t"),
        cell("c", "n").alias("n_c"),
        cell("t", "sx").alias("sx_t"),
        cell("c", "sx").alias("sx_c"),
        cell("t", "sy").alias("sy_t"),
        cell("c", "sy").alias("sy_c"),
        dec_to_double_wide(
            cell("t", "sxx") + cell("c", "sxx")
        ).alias("sxx_d"),
        dec_to_double_wide(
            cell("t", "sxy") + cell("c", "sxy")
        ).alias("sxy_d"),
    )
    scored = piv.selectExpr(
        "n_t",
        "n_c",
        "CAST(n_t + n_c AS DOUBLE) AS nd",
        "CAST(sx_t + sx_c AS DOUBLE) AS sx_d",
        "CAST(sy_t + sy_c AS DOUBLE) AS sy_d",
        "sxx_d",
        "sxy_d",
        "CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
        " - CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS diff_raw",
        "CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
        " - CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS diff_x",
    )
    return scored.selectExpr(
        "n_t",
        "n_c",
        "diff_raw",
        f"{_CU_THETA} AS theta",
        f"diff_raw - {_CU_THETA} * diff_x AS diff_cuped",
    )


cuped_adjusted_ab.__doc__ = cuped_adjusted_ab.__doc__.format(
    t=_CU_T, c=_CU_C, cut=_CU_CUT
)


# ---------------------------------------------------------------- Q54

_PM_B = 32  # permutations; fixed fan-out, the poisson-bootstrap shape
_PM_T = "BUILDING"
_PM_C = "MACHINERY"


def _perm_sql() -> str:
    units = f"""
    SELECT c_custkey AS cust,
           CASE WHEN c_mktsegment = '{_PM_T}' THEN 1 ELSE 0 END AS t,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS y
    FROM customer WHERE c_mktsegment IN ('{_PM_T}', '{_PM_C}')
    """
    obs = f"""
    SELECT CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS DOUBLE)
               / CAST(SUM(t) AS DOUBLE)
           - CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS DOUBLE)
               / CAST(SUM(1 - t) AS DOUBLE) AS d_obs
    FROM ({units})
    """
    perm = f"""
    SELECT b,
           CAST(SUM(CASE WHEN pt = 1 THEN y ELSE 0 END) AS DOUBLE)
               / CAST(SUM(pt) AS DOUBLE)
           - CAST(SUM(CASE WHEN pt = 0 THEN y ELSE 0 END) AS DOUBLE)
               / CAST(SUM(1 - pt) AS DOUBLE) AS d_b
    FROM (
        SELECT u.y, b.b,
               ('0x' || substr(md5(CAST(b.b AS VARCHAR) || ':'
                    || CAST(u.cust AS VARCHAR)), 1, 4))::BIGINT % 2 AS pt
        FROM ({units}) u
        CROSS JOIN (SELECT UNNEST(range(0, {_PM_B})) AS b) b
    )
    GROUP BY 1
    """
    return f"""
    SELECT o.d_obs, CAST({_PM_B} AS BIGINT) AS n_perm,
           CAST(SUM(CASE WHEN abs(p.d_b) >= abs(o.d_obs)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
           (CAST(1 AS DOUBLE)
            + CAST(SUM(CASE WHEN abs(p.d_b) >= abs(o.d_obs)
                       THEN 1 ELSE 0 END) AS DOUBLE))
               / CAST({_PM_B} + 1 AS DOUBLE) AS p_mc
    FROM ({perm}) p CROSS JOIN ({obs}) o
    GROUP BY o.d_obs
    """


@query(
    "permutation_test_segments",
    sql=_perm_sql(),
    tags=("analytics", "stats", "inference"),
)
def permutation_test_segments(spark, sf_dir):
    """Monte-Carlo permutation test of the {t}-vs-{c} mean balance
    gap: {b} label permutations (a deterministic md5 coin per
    (permutation, customer) — the seeded-hash discipline of the
    bootstrap tier, so both engines draw the SAME permutations),
    Monte-Carlo p = (1 + #{{|d_b| >= |d_obs|}}) / ({b} + 1) — the
    distribution-free twin of ab_test_pvalue: no normality, no
    variance formula, just the null enforced by relabeling.

    Exactness: per-permutation sums are exact BIGINT cents; each d_b
    and the comparison |d_b| >= |d_obs| evaluate on bitwise-identical
    doubles in both engines; the permutation fan-out is a fixed x{b}
    map-side explode (the poisson_bootstrap_ci scale shape).

    Scale shape: one customer scan, one x{b} explode into a {b}-row
    keyed reduce, one broadcast attach of the observed diff.
    """
    cust = read_table(spark, sf_dir, "customer")
    units = cust.where(
        F.col("c_mktsegment").isin(_PM_T, _PM_C)
    ).select(
        F.col("c_custkey").alias("cust"),
        F.when(F.col("c_mktsegment") == _PM_T, F.lit(1))
        .otherwise(F.lit(0))
        .alias("t"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("y"),
    )
    d_expr = (
        "CAST(SUM(CASE WHEN {g} = 1 THEN y ELSE 0 END) AS DOUBLE)"
        " / CAST(SUM({g}) AS DOUBLE)"
        " - CAST(SUM(CASE WHEN {g} = 0 THEN y ELSE 0 END) AS DOUBLE)"
        " / CAST(SUM(1 - {g}) AS DOUBLE)"
    )
    obs = units.selectExpr(f"{d_expr.format(g='t')} AS d_obs")
    perm = (
        units.select(
            "y",
            "cust",
            F.explode(
                F.sequence(F.lit(0), F.lit(_PM_B - 1))
            ).alias("b"),
        )
        .select(
            "y",
            "b",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("b").cast("string"),
                                F.lit(":"),
                                F.col("cust").cast("string"),
                            )
                        ),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
            ).alias("pt"),
        )
        .groupBy("b")
        .agg(F.expr(f"{d_expr.format(g='pt')}").alias("d_b"))
    )
    return (
        perm.crossJoin(F.broadcast(obs))
        .groupBy("d_obs")
        .agg(
            F.lit(_PM_B).cast("long").alias("n_perm"),
            F.sum(
                F.when(
                    F.abs(F.col("d_b")) >= F.abs(F.col("d_obs")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_ge"),
            (
                (
                    F.lit(1.0)
                    + F.sum(
                        F.when(
                            F.abs(F.col("d_b"))
                            >= F.abs(F.col("d_obs")),
                            1,
                        )
                        .otherwise(0)
                        .cast("double")
                    )
                )
                / F.lit(float(_PM_B + 1))
            ).alias("p_mc"),
        )
        .select("d_obs", "n_perm", "n_ge", "p_mc")
    )


permutation_test_segments.__doc__ = permutation_test_segments.__doc__.format(
    t=_PM_T, c=_PM_C, b=_PM_B
)
