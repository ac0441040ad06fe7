"""Information-theoretic corpus analytics on the portable ln/exp kernel.

- token_entropy_by_source   Shannon entropy (nats) + perplexity of the
                            token distribution per source — the
                            diversity card a mixture designer reads
                            before weighting corpora
- mutual_info_lang_source   mutual information + NMI between the lang
                            and source labels — "does source predict
                            language", the one-number leakage check on
                            a stratification design
- theil_index_by_nation     Theil T and L inequality of customer spend
                            per nation — the decomposable inequality
                            index (unlike Gini, Theil sums across
                            partitions of the population)

All three need ln() — transcendental, hence excluded from the oracle
gate for eight rounds (see graph5.py's RA-instead-of-Adamic-Adar note).
functions/portable.py::plog_stages / pexp_stages unlock them: both
engines evaluate the IDENTICAL fixed-order IEEE expression text, so
every per-row double is bitwise-equal, and the cross-row accumulation
uses the established scaled-integer stable sums (queries/_stable.py) —
order-free, exact, hash-identical.

Scale shape: everything here is explode -> keyed agg -> bounded-table
joins; the plog/pexp ladders are pure scalar expressions inside
whole-stage codegen (no UDF, no Python, no extra shuffle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.portable import (
    apply_stages,
    pexp_stages,
    plog_stages,
    sql_wrap_stages,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table, read_table_spread

# ---------------------------------------------------------------- Q1

_ENT_CNT = """
    SELECT source, w, COUNT(*) AS c FROM (
        SELECT source, unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    ) GROUP BY 1, 2
"""

# entropy H = ln(n) - (sum_w c ln c) / n, accumulated as scaled ints
_ENT_AGG = f"""
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           SUM(CAST(ROUND(c * _lc * 1000000) AS BIGINT)) AS _wsum
    FROM {{inner}} GROUP BY source
"""

_ENT_H = (
    "_ln - (CAST(_wsum AS DOUBLE) / 1000000.0)"
    " / CAST(n_tokens AS DOUBLE) AS entropy_nats"
)


def _entropy_sql() -> str:
    counts = sql_wrap_stages(_ENT_CNT, plog_stages("c", "_lc", "_p1_"))
    agg = _ENT_AGG.format(inner=counts)
    agg = sql_wrap_stages(agg, plog_stages("n_tokens", "_ln", "_p2_"))
    h = f"SELECT source, n_tokens, n_types, {_ENT_H} FROM {agg}"
    p = sql_wrap_stages(h, pexp_stages("entropy_nats", "perplexity", "_e1_"))
    return (
        "SELECT source, n_tokens, n_types, entropy_nats, perplexity"
        f" FROM {p}"
    )


@query(
    "token_entropy_by_source",
    sql=_entropy_sql(),
    tags=("llm", "infotheory", "textstats"),
)
def token_entropy_by_source(spark, sf_dir):
    """Shannon entropy (nats) and perplexity of each source's unigram
    token distribution — the standard corpus-diversity number (a source
    whose perplexity collapses is boilerplate; one whose entropy spikes
    is noise), computed per mixture component.

    Exactness: H = ln(n) - (1/n) * sum_w c_w ln(c_w) with every ln from
    the portable kernel (bitwise-equal across engines) and the weighted
    sum accumulated as ROUND(c * ln(c) * 1e6) BIGINTs — order-free.
    perplexity = pexp(H) closes the loop through the exp kernel.

    Scale: one explode + two keyed aggregates (map-side combined); the
    per-(source, token) table is vocabulary-sized. No window, no UDF.
    """
    docs = read_table_spread(spark, sf_dir, "documents", "doc_id")
    cnt = (
        docs.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cnt = apply_stages(cnt, plog_stages("c", "_lc", "_p1_"))
    per = cnt.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(
            F.expr("CAST(ROUND(c * _lc * 1000000) AS BIGINT)")
        ).alias("_wsum"),
    )
    per = apply_stages(per, plog_stages("n_tokens", "_ln", "_p2_"))
    h = per.selectExpr("source", "n_tokens", "n_types", _ENT_H)
    p = apply_stages(h, pexp_stages("entropy_nats", "perplexity", "_e1_"))
    return p.select(
        "source", "n_tokens", "n_types", "entropy_nats", "perplexity"
    )


# ---------------------------------------------------------------- Q2

_MI_CELLS = """
    SELECT c.lang, c.source, c.n, r.r, s.s, t.n_total FROM
        (SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2) c
        JOIN (SELECT lang, COUNT(*) AS r FROM documents GROUP BY 1) r
            ON c.lang = r.lang
        JOIN (SELECT source, COUNT(*) AS s FROM documents GROUP BY 1) s
            ON c.source = s.source
        CROSS JOIN (SELECT COUNT(*) AS n_total FROM documents) t
"""

# p_ij * ln(p_ij / (p_i p_j)) = (n/N) * (ln n + ln N - ln r - ln c)
_MI_TERM = (
    "CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)"
    " * ((_ln + _lt) - (_lr + _ls))"
)
# marginal entropy terms r ln r / c ln c (scaled-int accumulated)
_MI_AGG = """
    SELECT MAX(n_total) AS n_docs,
           COUNT(*) AS n_cells,
           SUM(CAST(ROUND(({term}) * 1000000000000) AS BIGINT)) AS _mi,
           MAX(_lt) AS _lt
    FROM {inner}
"""


def _mi_sql() -> str:
    cells = _MI_CELLS
    for src, out, p in (
        ("n", "_ln", "_m1_"),
        ("r", "_lr", "_m2_"),
        ("s", "_ls", "_m3_"),
        ("n_total", "_lt", "_m4_"),
    ):
        cells = sql_wrap_stages(cells, plog_stages(src, out, p))
    mi = _MI_AGG.format(term=_MI_TERM, inner=cells)
    # marginal entropies from per-lang / per-source tables
    hl = sql_wrap_stages(
        "SELECT lang, COUNT(*) AS r FROM documents GROUP BY 1",
        plog_stages("r", "_lr", "_h1_"),
    )
    hs = sql_wrap_stages(
        "SELECT source, COUNT(*) AS s FROM documents GROUP BY 1",
        plog_stages("s", "_ls", "_h2_"),
    )
    return f"""
    WITH mi AS ({mi}),
    hl AS (
        SELECT SUM(CAST(ROUND(r * _lr * 1000000) AS BIGINT)) AS wl,
               CAST(SUM(r) AS BIGINT) AS nl
        FROM {hl}
    ),
    hs AS (
        SELECT SUM(CAST(ROUND(s * _ls * 1000000) AS BIGINT)) AS ws,
               CAST(SUM(s) AS BIGINT) AS ns
        FROM {hs}
    )
    SELECT mi.n_docs, mi.n_cells,
           CAST(mi._mi AS DOUBLE) / 1000000000000.0 AS mi_nats,
           mi._lt - (CAST(hl.wl AS DOUBLE) / 1000000.0)
               / CAST(hl.nl AS DOUBLE) AS h_lang,
           mi._lt - (CAST(hs.ws AS DOUBLE) / 1000000.0)
               / CAST(hs.ns AS DOUBLE) AS h_source,
           (CAST(mi._mi AS DOUBLE) / 1000000000000.0)
               / sqrt((mi._lt - (CAST(hl.wl AS DOUBLE) / 1000000.0)
                           / CAST(hl.nl AS DOUBLE))
                      * (mi._lt - (CAST(hs.ws AS DOUBLE) / 1000000.0)
                           / CAST(hs.ns AS DOUBLE))) AS nmi
    FROM mi CROSS JOIN hl CROSS JOIN hs
    """


@query(
    "mutual_info_lang_source",
    sql=_mi_sql(),
    tags=("llm", "infotheory", "stats"),
)
def mutual_info_lang_source(spark, sf_dir):
    """Mutual information (nats) and sqrt-normalized NMI between the
    lang and source labels — the leakage / dependence check behind any
    stratified split or mixture design (MI ~ 0: source tells you
    nothing about language; NMI -> 1: they're the same partition).

    Exactness: every ln is the portable kernel on an INTEGER count
    (cell, margins, total), the 100-cell term sum and the marginal
    entropy sums accumulate as scaled BIGINTs, and the final NMI is a
    handful of identically-spelled IEEE ops; sqrt is correctly rounded
    by IEEE-754, hence bit-equal.

    Scale: ONE corpus scan — margins and the grand total are integer
    sums over the (lang, source) contingency aggregate, whose
    identical shuffle is planned once (exchange reuse); everything
    downstream is label-cardinality-sized.
    """
    docs = read_table(spark, sf_dir, "documents")
    # margins and the grand total derive from the contingency AGGREGATE
    # (exact integer sums of the same cells) — one corpus scan, not four
    base = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n")
    )
    cells = (
        base.join(
            F.broadcast(
                base.groupBy("lang").agg(F.sum("n").cast("long").alias("r"))
            ),
            "lang",
        )
        .join(
            F.broadcast(
                base.groupBy("source").agg(
                    F.sum("n").cast("long").alias("s")
                )
            ),
            "source",
        )
        .crossJoin(
            F.broadcast(
                base.agg(F.sum("n").cast("long").alias("n_total"))
            )
        )
    )
    for src, out, p in (
        ("n", "_ln", "_m1_"),
        ("r", "_lr", "_m2_"),
        ("s", "_ls", "_m3_"),
        ("n_total", "_lt", "_m4_"),
    ):
        cells = apply_stages(cells, plog_stages(src, out, p))
    mi = cells.agg(
        F.max("n_total").alias("n_docs"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(
            F.expr(f"CAST(ROUND(({_MI_TERM}) * 1000000000000) AS BIGINT)")
        ).alias("_mi"),
        F.max("_lt").alias("_lt"),
    )

    def marginal(col, lcol, p):
        m = base.groupBy(col).agg(F.sum("n").cast("long").alias("k"))
        m = apply_stages(m, plog_stages("k", lcol, p))
        return m.agg(
            F.sum(
                F.expr(f"CAST(ROUND(k * {lcol} * 1000000) AS BIGINT)")
            ).alias("w"),
            F.sum("k").cast("long").alias("n"),
        )

    hl = marginal("lang", "_lr", "_h1_")
    hs = marginal("source", "_ls", "_h2_")
    joined = mi.crossJoin(F.broadcast(hl.selectExpr("w AS wl", "n AS nl")))
    joined = joined.crossJoin(
        F.broadcast(hs.selectExpr("w AS ws", "n AS ns"))
    )
    return joined.selectExpr(
        "n_docs",
        "n_cells",
        "CAST(_mi AS DOUBLE) / 1000000000000.0 AS mi_nats",
        "_lt - (CAST(wl AS DOUBLE) / 1000000.0) / CAST(nl AS DOUBLE)"
        " AS h_lang",
        "_lt - (CAST(ws AS DOUBLE) / 1000000.0) / CAST(ns AS DOUBLE)"
        " AS h_source",
        "(CAST(_mi AS DOUBLE) / 1000000000000.0)"
        " / sqrt((_lt - (CAST(wl AS DOUBLE) / 1000000.0)"
        " / CAST(nl AS DOUBLE))"
        " * (_lt - (CAST(ws AS DOUBLE) / 1000000.0)"
        " / CAST(ns AS DOUBLE))) AS nmi",
    )


# ---------------------------------------------------------------- Q3

_THEIL_SPEND = """
    SELECT n_nationkey AS nation_key, n_name AS nation, x FROM (
        SELECT c.c_nationkey AS nk,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS x
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_nationkey
    ) JOIN nation ON nk = n_nationkey
"""

_THEIL_NAT = """
    SELECT nation_key, nation, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s
    FROM {inner} GROUP BY 1, 2
"""

# T = (1/n) sum (x n / s)(ln x + ln n - ln s);  L = ln s - ln n - mean ln x
_THEIL_T = (
    "CAST(x AS DOUBLE) * CAST(n AS DOUBLE) / CAST(s AS DOUBLE)"
    " * ((_lx + _ln) - _ls)"
)


def _theil_sql() -> str:
    per = f"""
    SELECT a.nation_key, a.nation, a.x, b.n, b.s
    FROM ({_THEIL_SPEND}) a
    JOIN ({_THEIL_NAT.format(inner=f'({_THEIL_SPEND})')}) b
        ON a.nation_key = b.nation_key
    """
    for src, out, p in (
        ("x", "_lx", "_t1_"),
        ("n", "_ln", "_t2_"),
        ("s", "_ls", "_t3_"),
    ):
        per = sql_wrap_stages(per, plog_stages(src, out, p))
    return f"""
    SELECT nation, MAX(n) AS n_customers,
           CAST(SUM(CAST(ROUND(({_THEIL_T}) * 1000000000) AS BIGINT))
                AS DOUBLE) / 1000000000.0 / CAST(MAX(n) AS DOUBLE)
               AS theil_t,
           CAST(SUM(CAST(ROUND((_ls - _ln - _lx) * 1000000000) AS BIGINT))
                AS DOUBLE) / 1000000000.0 / CAST(MAX(n) AS DOUBLE)
               AS theil_l
    FROM {per} GROUP BY nation
    """


@query(
    "theil_index_by_nation",
    sql=_theil_sql(),
    tags=("analytics", "infotheory", "inequality"),
)
def theil_index_by_nation(spark, sf_dir):
    """Theil T and Theil L inequality of customer lifetime spend within
    each nation — the decomposable inequality pair (within-group Theils
    aggregate exactly to the population index, which Gini can't do;
    this is the per-partition drill-down of gini_customer_spend).

    Exactness: spend is exact integer cents; T's weight x*n/s and L's
    ln(mu/x) = ln s - ln n - ln x use portable lns of INTEGER arguments
    only, so every per-customer term is bit-identical and the
    per-nation sums accumulate as scaled BIGINTs.

    Scale: customer-grain aggregate, 25-row per-nation table broadcast
    back onto customers, one final keyed agg — no window, no UDF.
    """
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    spend = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            )
            .cast("long")
            .alias("x")
        )
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("c_nationkey"),
                    F.col("n_name").alias("nation"),
                )
            ),
            "c_nationkey",
        )
        .select(
            F.col("c_nationkey").alias("nation_key"), "nation", "x"
        )
    )
    nat = spend.groupBy("nation_key", "nation").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").cast("long").alias("s")
    )
    per = spend.join(
        F.broadcast(nat.select("nation_key", "n", "s")), "nation_key"
    )
    for src, out, p in (
        ("x", "_lx", "_t1_"),
        ("n", "_ln", "_t2_"),
        ("s", "_ls", "_t3_"),
    ):
        per = apply_stages(per, plog_stages(src, out, p))
    return per.groupBy("nation").agg(
        F.max("n").alias("n_customers"),
        F.expr(
            f"CAST(SUM(CAST(ROUND(({_THEIL_T}) * 1000000000) AS BIGINT))"
            " AS DOUBLE) / 1000000000.0 / CAST(MAX(n) AS DOUBLE)"
        ).alias("theil_t"),
        F.expr(
            "CAST(SUM(CAST(ROUND((_ls - _ln - _lx) * 1000000000)"
            " AS BIGINT)) AS DOUBLE) / 1000000000.0"
            " / CAST(MAX(n) AS DOUBLE)"
        ).alias("theil_l"),
    )
