"""Analytics batch 15: classifier-agreement and family-wise error
control — the evaluation statistics a labeling/filtering pipeline needs
once it runs MORE THAN ONE judge over the same rows:

- holm_stepdown_family      Holm-Bonferroni step-down over the same
                            25-nation z-test family fdr_bh_qvalues
                            controls — the FWER companion to BH's FDR
                            (strictly stronger guarantee, for the
                            sheets where ONE false alarm is costly)
- mcnemar_gate_vs_length    McNemar's paired test: do the keyword gate
                            and the length gate disagree SYMMETRICALLY
                            on English-detection, or is one strictly
                            better (discordant-pair asymmetry)
- cochran_q_gates           Cochran's Q over three binary quality
                            gates per document — "do these gates pass
                            the same share of docs" before anyone
                            tunes thresholds one gate at a time
- friedman_event_value_daily Friedman rank test: does daily revenue
                            rank the five event types consistently
                            across days (blocks = days)
- kendall_w_sources         Kendall's coefficient of concordance over
                            three source rankings (docs, chars, vocab)
                            — the agreement number behind the Borda
                            fusion borda_source_ranking already ships
- untapped_customer_balance TPC-H Q22 shape: above-average-balance
                            customers with NO orders, per nation — the
                            classic scalar-subquery + anti-join
                            decorrelation pattern

All statistics are exact-integer inside (counts, ranks, cent sums;
128-bit where squares can overflow) with ONE shared double expression
at the end; p-values go through the portable normal/exp kernels, so
every query is full-value oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.portable import (
    apply_stages,
    pexp_stages,
    pnorm_stages,
    sql_wrap_stages,
)
from tvbigdataproject_spark.queries._stable import (
    dec_to_double_wide,
    sql_huge_to_double_wide,
)
from tvbigdataproject_spark.queries.analytic13 import _FDR_Z
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# ---------------------------------------------------------------- Q63

# Holm step-down: on the p-ascending ranking, adj_i = p_i * (m - i + 1);
# the reported value is the running MAX of adj over ranks <= i, capped
# at 1 — monotone non-decreasing, the step-down rule's actual output.
_HOLM_RAW = "p_raw * CAST(m - rk + 1 AS DOUBLE)"
_HOLM_ADJ = (
    "LEAST(CAST(1 AS DOUBLE), MAX(adj_raw) OVER ("
    "ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"
)


def _holm_sql() -> str:
    base = """
    SELECT n.n_name AS nation,
           COUNT(*) AS n_i,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS s_i
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """
    glob = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_g,
           CAST(SUM(cents) AS BIGINT) AS s_g,
           SUM(CAST(cents AS HUGEINT) * cents) AS sq_g
    FROM (SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
          FROM customer)
    """
    joined = f"""
    SELECT b.*, g.n_g, g.s_g,
           {sql_huge_to_double_wide('g.sq_g')} AS sq_g_d
    FROM ({base}) b CROSS JOIN ({glob}) g
    """
    scored = sql_wrap_stages(
        f"(SELECT *, {_FDR_Z} AS z FROM ({joined}))",
        pnorm_stages("CAST(0 AS DOUBLE) - abs(z)", "_phi", "_hm_"),
    )
    ranked = f"""
    SELECT nation, n_i, z, p_raw,
           ROW_NUMBER() OVER (ORDER BY p_raw, nation) AS rk,
           COUNT(*) OVER () AS m
    FROM (SELECT nation, n_i, z,
                 CAST(2 AS DOUBLE) * _phi AS p_raw
          FROM {scored})
    """
    return f"""
    SELECT nation, n_i AS n_customers, z, p_raw, rk AS p_rank,
           {_HOLM_ADJ} AS p_holm
    FROM (SELECT *, {_HOLM_RAW} AS adj_raw FROM ({ranked}))
    """


@query(
    "holm_stepdown_family",
    sql=_holm_sql(),
    tags=("analytics", "stats", "inference"),
)
def holm_stepdown_family(spark, sf_dir):
    """Holm-Bonferroni adjusted p-values for the 25-nation mean-balance
    z-test family — the FWER control: where fdr_bh_qvalues bounds the
    EXPECTED false-discovery share, Holm bounds the probability of ANY
    false alarm, uniformly dominating plain Bonferroni at no cost (the
    step-down multiplies the i-th smallest p by m-i+1 and enforces
    monotonicity with a running max).

    Exactness: identical z/p machinery as the BH query (exact cent
    sums, 128-bit squared sum, portable normal CDF); the adjustment is
    two window functions over the bounded 25-row test table.

    Scale shape: one customer scan into a dim-bounded test table; the
    step-down windows never see fact rows.
    """
    cust = read_table(spark, sf_dir, "customer")
    nat = read_table(spark, sf_dir, "nation")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    base = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_i"),
            F.sum(cents).cast("long").alias("s_i"),
        )
    )
    glob = cust.select(cents.alias("cents")).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("cents").cast("long").alias("s_g"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "sq_g"
        ),
    )
    glob = glob.select(
        "n_g", "s_g", dec_to_double_wide(F.col("sq_g")).alias("sq_g_d")
    )
    scored = base.crossJoin(F.broadcast(glob)).selectExpr(
        "*", f"{_FDR_Z} AS z"
    )
    scored = apply_stages(
        scored, pnorm_stages("CAST(0 AS DOUBLE) - abs(z)", "_phi", "_hm_")
    )
    ranked = scored.selectExpr(
        "nation", "n_i", "z", "CAST(2 AS DOUBLE) * _phi AS p_raw"
    ).selectExpr(
        "*",
        "ROW_NUMBER() OVER (ORDER BY p_raw, nation) AS rk",
        "COUNT(*) OVER () AS m",
    )
    return ranked.selectExpr("*", f"{_HOLM_RAW} AS adj_raw").selectExpr(
        "nation",
        "n_i AS n_customers",
        "z",
        "p_raw",
        "rk AS p_rank",
        f"{_HOLM_ADJ} AS p_holm",
    )


# ---------------------------------------------------------------- Q64

# the two cheap English detectors under test (gold = lang = 'en'):
# A: the keyword gate ("the" appears as a token), B: the length gate
_MCN_STAT = (
    "CASE WHEN b_disc + c_disc = 0 THEN CAST(0 AS DOUBLE) ELSE "
    "CAST((b_disc - c_disc) * (b_disc - c_disc) AS DOUBLE)"
    " / CAST(b_disc + c_disc AS DOUBLE) END"
)
# chi-square(df=1) survival: P(X > x) = 2 * Phi(-sqrt(x))
_MCN_P = "CAST(2 AS DOUBLE) * _phi"


def _mcnemar_sql() -> str:
    inner = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN a_right AND NOT b_right THEN 1 ELSE 0 END)
                AS BIGINT) AS b_disc,
           CAST(SUM(CASE WHEN b_right AND NOT a_right THEN 1 ELSE 0 END)
                AS BIGINT) AS c_disc
    FROM (
        SELECT (list_contains(string_split(lower(text), ' '), 'the'))
                   = (lang = 'en') AS a_right,
               (n_chars >= 150) = (lang = 'en') AS b_right
        FROM documents
    )
    """
    scored = sql_wrap_stages(
        f"(SELECT *, {_MCN_STAT} AS chi2 FROM ({inner}))",
        pnorm_stages("CAST(0 AS DOUBLE) - sqrt(chi2)", "_phi", "_mc_"),
    )
    return f"""
    SELECT n_docs, b_disc AS a_only_right, c_disc AS b_only_right,
           chi2 AS mcnemar_chi2, {_MCN_P} AS p_value
    FROM {scored}
    """


@query(
    "mcnemar_gate_vs_length",
    sql=_mcnemar_sql(),
    tags=("analytics", "stats", "eval"),
)
def mcnemar_gate_vs_length(spark, sf_dir):
    """McNemar's paired test comparing two cheap English detectors on
    the same documents (gold = the lang label): A = keyword gate ("the"
    occurs as a token), B = length gate (n_chars >= 150). Only the
    DISCORDANT pairs carry information — b = A-right/B-wrong, c =
    B-right/A-wrong — and chi2 = (b-c)^2/(b+c) asks whether the two
    gates' error profiles differ beyond coin flips. The test every
    labeler swap should pass before replacing gate A with gate B.

    Exactness: b, c are exact integer counts; chi2 is one shared
    double expression; p = 2*Phi(-sqrt(chi2)) via the portable normal
    kernel (the df=1 chi-square survival identity).

    Scale shape: one documents scan -> a single global aggregate row;
    nothing is per-pair (the pairing is per-row conjunction).
    """
    docs = read_table(spark, sf_dir, "documents")
    a_right = F.array_contains(
        F.split(F.lower("text"), " "), "the"
    ) == (F.col("lang") == "en")
    b_right = (F.col("n_chars") >= 150) == (F.col("lang") == "en")
    agg = docs.select(
        a_right.alias("a_right"), b_right.alias("b_right")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("a_right") & ~F.col("b_right"), 1).otherwise(0)
        )
        .cast("long")
        .alias("b_disc"),
        F.sum(
            F.when(F.col("b_right") & ~F.col("a_right"), 1).otherwise(0)
        )
        .cast("long")
        .alias("c_disc"),
    )
    scored = agg.selectExpr("*", f"{_MCN_STAT} AS chi2")
    scored = apply_stages(
        scored, pnorm_stages("CAST(0 AS DOUBLE) - sqrt(chi2)", "_phi", "_mc_")
    )
    return scored.selectExpr(
        "n_docs",
        "b_disc AS a_only_right",
        "c_disc AS b_only_right",
        "chi2 AS mcnemar_chi2",
        f"{_MCN_P} AS p_value",
    )


# ---------------------------------------------------------------- Q65

# Cochran's Q over k=3 binary gates: Q = (k-1)(k*sum C_j^2 - T^2)
# / (k*T - sum R_i^2); under H0 ~ chi-square(k-1=2), survival e^{-Q/2}
_CQ_K = 3
_CQ_STAT = (
    f"CASE WHEN {_CQ_K} * t_tot - sum_r2 = 0 THEN CAST(0 AS DOUBLE) ELSE "
    f"CAST(({_CQ_K} - 1) * ({_CQ_K} * sum_c2 - t_tot * t_tot) AS DOUBLE)"
    f" / CAST({_CQ_K} * t_tot - sum_r2 AS DOUBLE) END"
)


def _cochran_sql() -> str:
    inner = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(g1) AS BIGINT) AS c1,
           CAST(SUM(g2) AS BIGINT) AS c2,
           CAST(SUM(g3) AS BIGINT) AS c3,
           CAST(SUM(g1) * SUM(g1) + SUM(g2) * SUM(g2)
                + SUM(g3) * SUM(g3) AS BIGINT) AS sum_c2,
           CAST(SUM(g1 + g2 + g3) AS BIGINT) AS t_tot,
           CAST(SUM((g1 + g2 + g3) * (g1 + g2 + g3)) AS BIGINT) AS sum_r2
    FROM (
        SELECT CASE WHEN len(string_split(lower(text), ' ')) >= 25
                    THEN 1 ELSE 0 END AS g1,
               CASE WHEN list_contains(string_split(lower(text), ' '),
                                       'the') THEN 1 ELSE 0 END AS g2,
               CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS g3
        FROM documents
    )
    """
    scored = sql_wrap_stages(
        f"(SELECT *, {_CQ_STAT} AS q_stat FROM ({inner}))",
        pexp_stages(
            "CAST(0 AS DOUBLE) - q_stat / CAST(2 AS DOUBLE)", "_pq", "_cq_"
        ),
    )
    return f"""
    SELECT n_docs, c1 AS pass_tokens, c2 AS pass_keyword,
           c3 AS pass_length, q_stat AS cochran_q, _pq AS p_value
    FROM {scored}
    """


@query(
    "cochran_q_gates",
    sql=_cochran_sql(),
    tags=("analytics", "stats", "quality"),
)
def cochran_q_gates(spark, sf_dir):
    """Cochran's Q test over three binary quality gates applied to
    every document (token count >= 25, contains 'the', n_chars >= 150):
    do the k gates pass the same proportion of rows, or is at least one
    systematically stricter? The k-treatment generalization of McNemar
    — the sanity check before per-gate thresholds are tuned in
    isolation.

    Exactness: column totals, grand total and per-row-total squares are
    exact BIGINTs (row totals <= 3, squares <= 9); Q is one shared
    double expression; p = e^(-Q/2), the CLOSED-FORM chi-square(df=2)
    survival, through the portable exp kernel.

    Scale shape: one documents scan into a single aggregate row; the
    per-row gate triple never leaves the map side.
    """
    docs = read_table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    g1 = F.when(F.size(ws) >= 25, 1).otherwise(0)
    g2 = F.when(F.array_contains(ws, "the"), 1).otherwise(0)
    g3 = F.when(F.col("n_chars") >= 150, 1).otherwise(0)
    rows = docs.select(g1.alias("g1"), g2.alias("g2"), g3.alias("g3"))
    agg = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("g1").cast("long").alias("c1"),
        F.sum("g2").cast("long").alias("c2"),
        F.sum("g3").cast("long").alias("c3"),
        (
            F.sum("g1") * F.sum("g1")
            + F.sum("g2") * F.sum("g2")
            + F.sum("g3") * F.sum("g3")
        )
        .cast("long")
        .alias("sum_c2"),
        F.sum(F.col("g1") + F.col("g2") + F.col("g3"))
        .cast("long")
        .alias("t_tot"),
        F.sum(
            (F.col("g1") + F.col("g2") + F.col("g3"))
            * (F.col("g1") + F.col("g2") + F.col("g3"))
        )
        .cast("long")
        .alias("sum_r2"),
    )
    scored = agg.selectExpr("*", f"{_CQ_STAT} AS q_stat")
    scored = apply_stages(
        scored,
        pexp_stages(
            "CAST(0 AS DOUBLE) - q_stat / CAST(2 AS DOUBLE)", "_pq", "_cq_"
        ),
    )
    return scored.selectExpr(
        "n_docs",
        "c1 AS pass_tokens",
        "c2 AS pass_keyword",
        "c3 AS pass_length",
        "q_stat AS cochran_q",
        "_pq AS p_value",
    )


# ---------------------------------------------------------------- Q66

_FR_TYPES = ("click", "error", "purchase", "signup", "view")
_FR_K = len(_FR_TYPES)
# chi2_F = 12*sum R_j^2 / (n k (k+1)) - 3 n (k+1); df = k-1 = 4, whose
# closed-form survival is e^{-x/2} * (1 + x/2) (even df)
_FR_STAT = (
    f"CAST(12 AS DOUBLE) * CAST(sum_rj2 AS DOUBLE)"
    f" / (CAST(n_days AS DOUBLE) * CAST({_FR_K} AS DOUBLE)"
    f" * CAST({_FR_K + 1} AS DOUBLE))"
    f" - CAST(3 AS DOUBLE) * CAST(n_days AS DOUBLE)"
    f" * CAST({_FR_K + 1} AS DOUBLE)"
)
_FR_P = "(CAST(1 AS DOUBLE) + fr_chi2 / CAST(2 AS DOUBLE)) * _pe"


def _friedman_sql() -> str:
    types = ", ".join(f"'{t}'" for t in _FR_TYPES)
    cells = f"""
    SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events WHERE event_type IN ({types})
    GROUP BY 1, 2
    """
    full = f"""
    SELECT * FROM ({cells})
    WHERE day IN (SELECT day FROM ({cells})
                  GROUP BY 1 HAVING COUNT(*) = {_FR_K})
    """
    ranked = f"""
    SELECT event_type,
           ROW_NUMBER() OVER (PARTITION BY day
                              ORDER BY cents, event_type) AS r
    FROM ({full})
    """
    stat = f"""
    SELECT CAST(2 * SUM(rj) / ({_FR_K} * {_FR_K + 1}) AS BIGINT)
               AS n_days,
           CAST(SUM(rj * rj) AS BIGINT) AS sum_rj2
    FROM (SELECT event_type, CAST(SUM(r) AS BIGINT) AS rj
          FROM ({ranked}) GROUP BY 1)
    """
    scored = sql_wrap_stages(
        f"(SELECT *, {_FR_STAT} AS fr_chi2 FROM ({stat}))",
        pexp_stages(
            "CAST(0 AS DOUBLE) - fr_chi2 / CAST(2 AS DOUBLE)", "_pe", "_fr_"
        ),
    )
    return f"""
    SELECT n_days, sum_rj2, fr_chi2 AS friedman_chi2, {_FR_P} AS p_value
    FROM {scored}
    """


@query(
    "friedman_event_value_daily",
    sql=_friedman_sql(),
    tags=("analytics", "stats", "inference"),
)
def friedman_event_value_daily(spark, sf_dir):
    """Friedman rank test, blocks = days, treatments = the five event
    types: does daily revenue (exact cent sums) rank the event types
    CONSISTENTLY across days? The repeated-measures companion to
    kruskal_wallis_value — within-day ranking removes day-level level
    shifts before asking whether the type ordering is stable.

    Determinism: only days where all {k} types appear enter; within-day
    ranks are ROW_NUMBER over (cents, type) — a deterministic total
    order both engines share (exact cent sums tie only on identical
    totals, which the type tiebreak resolves identically). chi2_F is
    one shared double expression over exact integer rank sums; p uses
    the CLOSED-FORM chi-square(df=4) survival e^(-x/2)(1 + x/2)
    (df = k-1 is even) through the portable exp kernel.

    Scale shape: events collapse to the bounded (day x type) grid
    map-side; ranking windows run per-day over {k} rows; the statistic
    is a {k}-row aggregate.
    """
    ev = read_table(spark, sf_dir, "events")
    cells = (
        ev.where(F.col("event_type").isin(*_FR_TYPES))
        .groupBy(
            F.to_date("ts").alias("day"), "event_type"
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    full_days = (
        cells.groupBy("day")
        .agg(F.count(F.lit(1)).alias("k"))
        .where(F.col("k") == _FR_K)
        .select("day")
    )
    full = cells.join(full_days, "day")
    from pyspark.sql import Window

    ranked = full.select(
        "event_type",
        F.row_number()
        .over(
            Window.partitionBy("day").orderBy("cents", "event_type")
        )
        .alias("r"),
    )
    stat = (
        ranked.groupBy("event_type")
        .agg(F.sum("r").cast("long").alias("rj"))
        .agg(
            F.sum(F.col("rj") * F.col("rj")).cast("long").alias("sum_rj2"),
            F.sum("rj").cast("long").alias("_rsum"),
        )
        .selectExpr(
            # every complete block contributes 1+..+k = k(k+1)/2 to the
            # total rank sum, so n = 2*sum(rj)/(k(k+1)) — exact ints
            f"CAST(2 * _rsum / ({_FR_K} * {_FR_K + 1}) AS BIGINT)"
            " AS n_days",
            "sum_rj2",
        )
    )
    scored = stat.selectExpr("*", f"{_FR_STAT} AS fr_chi2")
    scored = apply_stages(
        scored,
        pexp_stages(
            "CAST(0 AS DOUBLE) - fr_chi2 / CAST(2 AS DOUBLE)", "_pe", "_fr_"
        ),
    )
    return scored.selectExpr(
        "n_days", "sum_rj2", "fr_chi2 AS friedman_chi2", f"{_FR_P} AS p_value"
    )


# ---------------------------------------------------------------- Q67

_KW_K = 3  # three independent source rankings
# W = (12*sum R_i^2 - 3 k^2 n (n+1)^2) / (k^2 n (n^2 - 1))
_KW_STAT = (
    f"(CAST(12 AS DOUBLE) * CAST(sum_r2 AS DOUBLE)"
    f" - CAST(3 * {_KW_K} * {_KW_K} AS DOUBLE) * CAST(n AS DOUBLE)"
    f" * CAST((n + 1) * (n + 1) AS DOUBLE))"
    f" / (CAST({_KW_K} * {_KW_K} AS DOUBLE) * CAST(n AS DOUBLE)"
    f" * CAST(n * n - 1 AS DOUBLE))"
)


def _kendall_w_sql() -> str:
    per_src = """
    SELECT d.source, d.n_docs, d.n_chars_tot, v.vocab
    FROM (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS n_chars_tot
          FROM documents GROUP BY 1) d
    JOIN (SELECT source, CAST(COUNT(DISTINCT w) AS BIGINT) AS vocab
          FROM (SELECT source,
                       UNNEST(string_split(lower(text), ' ')) AS w
                FROM documents)
          GROUP BY 1) v ON d.source = v.source
    """
    ranked = f"""
    SELECT source,
           ROW_NUMBER() OVER (ORDER BY n_docs DESC, source) AS r1,
           ROW_NUMBER() OVER (ORDER BY n_chars_tot DESC, source) AS r2,
           ROW_NUMBER() OVER (ORDER BY vocab DESC, source) AS r3
    FROM ({per_src})
    """
    return f"""
    SELECT n AS n_sources, sum_r2, {_KW_STAT} AS kendall_w
    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM((r1 + r2 + r3) * (r1 + r2 + r3)) AS BIGINT)
                     AS sum_r2
          FROM ({ranked}))
    """


@query(
    "kendall_w_sources",
    sql=_kendall_w_sql(),
    tags=("analytics", "stats", "ranking"),
)
def kendall_w_sources(spark, sf_dir):
    """Kendall's coefficient of concordance W across three rankings of
    the 20 sources (by document count, by total characters, by distinct
    vocabulary): W = 1 means the three metrics rank sources
    identically, W = 0 means no agreement — the agreement score behind
    the Borda fusion (borda_source_ranking), answering "is fusing these
    rankings even meaningful".

    Determinism: each ranking is ROW_NUMBER over (metric DESC, source)
    — exact integer metrics, deterministic tiebreak; sum of squared
    rank totals is an exact BIGINT; W is one shared double expression.

    Scale shape: one token-level aggregate to the bounded source table
    (20 rows at any SF); ranking windows and the statistic run over
    that bounded table only.
    """
    docs = read_table(spark, sf_dir, "documents")
    # doc-level metrics from the un-exploded table (an exploded COUNT(*)
    # would count tokens, not docs); vocabulary from the token explode
    vocab = (
        docs.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        .groupBy("source")
        .agg(F.countDistinct("w").cast("long").alias("vocab"))
    )
    per_doc = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars_tot"),
    )
    per_src = per_doc.join(vocab, "source")
    from pyspark.sql import Window

    ranked = per_src.select(
        "source",
        F.row_number()
        .over(Window.orderBy(F.col("n_docs").desc(), "source"))
        .alias("r1"),
        F.row_number()
        .over(Window.orderBy(F.col("n_chars_tot").desc(), "source"))
        .alias("r2"),
        F.row_number()
        .over(Window.orderBy(F.col("vocab").desc(), "source"))
        .alias("r3"),
    )
    stat = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            (F.col("r1") + F.col("r2") + F.col("r3"))
            * (F.col("r1") + F.col("r2") + F.col("r3"))
        )
        .cast("long")
        .alias("sum_r2"),
    )
    return stat.selectExpr(
        "n AS n_sources", "sum_r2", f"{_KW_STAT} AS kendall_w"
    )


# ---------------------------------------------------------------- Q68


_UT_LAPSE_DAYS = 180


@query(
    "untapped_customer_balance",
    sql=f"""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_cents
        FROM customer WHERE c_acctbal > 0.0
    ),
    cutoff AS (
        SELECT MAX(CAST(o_orderdate AS DATE))
               - INTERVAL {_UT_LAPSE_DAYS} DAY AS cut
        FROM orders
    )
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_untapped,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    CROSS JOIN avg_bal a
    WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) > a.avg_cents
      AND NOT EXISTS (SELECT 1 FROM orders o CROSS JOIN cutoff t
                      WHERE o.o_custkey = c.c_custkey
                        AND CAST(o.o_orderdate AS DATE) > t.cut)
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("relational", "tpch", "subquery"),
)
def untapped_customer_balance(spark, sf_dir):
    """TPC-H Q22 shape: per nation, the count and total balance of
    customers whose balance exceeds the positive-balance global average
    but who placed NO order in the dataset's trailing {d} days (the
    generator gives every customer at least one lifetime order, so the
    lapsed-window variant is the non-vacuous form of "money sitting
    with inactive accounts") — two scalar subqueries (global average,
    global max date) + the classic NOT EXISTS anti-join decorrelation.

    Exactness: balances compared and summed in exact integer cents;
    the average is one shared double division; the cutoff is exact
    date arithmetic (engine-specific spelling, identical value).

    Scale shape: both scalars are one-row broadcasts; the NOT EXISTS
    decorrelates to a left-anti join on o_custkey against the
    date-filtered orders (filter pushed to the scan); output is
    nation-bounded.
    """
    cust = read_table(spark, sf_dir, "customer")
    nat = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(cents).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_cents")
        )
    )
    cutoff = orders.agg(
        F.date_sub(
            F.max(F.to_date("o_orderdate")), _UT_LAPSE_DAYS
        ).alias("cut")
    )
    rich = (
        cust.select("c_custkey", "c_nationkey", cents.alias("cents"))
        .crossJoin(F.broadcast(avg_bal))
        .where(F.col("cents") > F.col("avg_cents"))
    )
    recent = (
        orders.select(
            F.col("o_custkey").alias("c_custkey"),
            F.to_date("o_orderdate").alias("od"),
        )
        .crossJoin(F.broadcast(cutoff))
        .where(F.col("od") > F.col("cut"))
    )
    lapsed = rich.join(recent, "c_custkey", "left_anti")
    return (
        lapsed.join(F.broadcast(nat), lapsed.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_untapped"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .orderBy("nation")
    )


untapped_customer_balance.__doc__ = untapped_customer_balance.__doc__.format(
    d=_UT_LAPSE_DAYS
)
