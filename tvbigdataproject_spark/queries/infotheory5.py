"""Portable-ln batch 5: comparative-corpus and ML-evaluation metrics.

- info_gain_lang_features   information gain of cheap binary text
                            features w.r.t. the language label — the
                            decision-tree / feature-selection number
- log_odds_dirichlet_terms  Monroe, Colaresi & Quinn (2008) "Fightin'
                            Words": Dirichlet-smoothed log-odds with
                            variance-based z-scores between two sources
- auc_quality_langid        ROC AUC of the logistic quality score as
                            an en-vs-rest classifier, via the
                            Mann-Whitney rank-sum identity on a
                            quantized score grid
- ndcg_bm25_eval            NDCG@20 of the BM25 run against graded
                            term-frequency relevance — the standard
                            ranking-quality eval (log-discount needs
                            the portable kernel)
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

# ---------------------------------------------------------------- Q18

# binary features over per-doc token stats; thresholds are arbitrary
# but fixed (the operator is the IG machinery, not the feature design)
_IG_FEATURES = (
    ("has_digit", "n_dig >= 1"),
    ("long_doc", "n_tok >= 90"),
    ("wordy", "n_chr >= 5 * n_tok"),
)

_IG_STATS = """
    SELECT doc_id, lang, COUNT(*) AS n_tok,
           CAST(SUM(length(w)) AS BIGINT) AS n_chr,
           SUM(CASE WHEN regexp_matches(w, '[0-9]') THEN 1 ELSE 0 END)
               AS n_dig
    FROM (SELECT doc_id, lang,
                 unnest(string_split(lower(text), ' ')) AS w
          FROM documents)
    GROUP BY 1, 2
"""


def _ig_sql() -> str:
    melt = " UNION ALL ".join(
        f"SELECT '{name}' AS feature,"
        f" CASE WHEN {cond} THEN 1 ELSE 0 END AS v, lang"
        f" FROM stats"
        for name, cond in _IG_FEATURES
    )
    cells = sql_wrap_stages(
        f"SELECT feature, v, lang, COUNT(*) AS c FROM ({melt})"
        " GROUP BY 1, 2, 3",
        plog_stages("c", "_lc", "_g1_"),
    )
    margins = sql_wrap_stages(
        f"SELECT feature, v, COUNT(*) AS m FROM ({melt}) GROUP BY 1, 2",
        plog_stages("m", "_lm", "_g2_"),
    )
    lang = sql_wrap_stages(
        "SELECT lang, COUNT(*) AS l FROM documents GROUP BY 1",
        plog_stages("l", "_ll", "_g3_"),
    )
    tot = sql_wrap_stages(
        "SELECT COUNT(*) AS n FROM documents",
        plog_stages("n", "_ln", "_g4_"),
    )
    return f"""
    WITH stats AS ({_IG_STATS}),
    svl AS (
        SELECT feature,
               SUM(CAST(ROUND(c * _lc * 1000000) AS BIGINT)) AS svl
        FROM {cells} GROUP BY 1
    ),
    sv AS (
        SELECT feature,
               SUM(CAST(ROUND(m * _lm * 1000000) AS BIGINT)) AS sv
        FROM {margins} GROUP BY 1
    ),
    sl AS (
        SELECT SUM(CAST(ROUND(l * _ll * 1000000) AS BIGINT)) AS sl
        FROM {lang}
    ),
    t AS (SELECT n, _ln FROM {tot})
    SELECT svl.feature,
           t._ln - (CAST(sl.sl AS DOUBLE) / CAST(1000000 AS DOUBLE))
               / CAST(t.n AS DOUBLE) AS h_lang,
           ((CAST(svl.svl AS DOUBLE) / CAST(1000000 AS DOUBLE))
                / CAST(t.n AS DOUBLE)
            - (CAST(sv.sv AS DOUBLE) / CAST(1000000 AS DOUBLE))
                / CAST(t.n AS DOUBLE))
           - ((CAST(sl.sl AS DOUBLE) / CAST(1000000 AS DOUBLE))
                / CAST(t.n AS DOUBLE) - t._ln) AS ig_nats
    FROM svl JOIN sv ON svl.feature = sv.feature
    CROSS JOIN sl CROSS JOIN t
    """


@query(
    "info_gain_lang_features",
    sql=_ig_sql(),
    tags=("llm", "infotheory", "features"),
)
def info_gain_lang_features(spark, sf_dir):
    """Information gain IG(lang; f) of three cheap binary text
    features — the feature-selection screen run before training any
    label classifier (a feature with IG ~ 0 can be dropped from the
    tree/regression without looking at a model).

    IG = H(lang) - H(lang | f), computed from the identity
    N*IG = Svl - Sv - Sl + N ln N with S* = sum c ln c over the cell,
    feature-margin, and lang-margin tables — every ln a portable
    kernel on an INTEGER count, every sum a scaled-BIGINT stable sum
    over label-cardinality-bounded tables.

    Scale shape: one token-stats aggregate, then a 3-way melt of
    BOUNDED tables (2 x 5 cells per feature); the final join is
    single-digit rows.
    """
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
    melted = None
    for name, cond in _IG_FEATURES:
        part = stats.selectExpr(
            f"'{name}' AS feature",
            f"CASE WHEN {cond} THEN 1 ELSE 0 END AS v",
            "lang",
        )
        melted = part if melted is None else melted.unionByName(part)
    cells = melted.groupBy("feature", "v", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    cells = apply_stages(cells, plog_stages("c", "_lc", "_g1_"))
    svl = cells.groupBy("feature").agg(
        F.sum(F.expr("CAST(ROUND(c * _lc * 1000000) AS BIGINT)")).alias(
            "svl"
        )
    )
    # feature margins derive from the cell aggregate (integer sums over
    # the <=10-row cells) — the melt is scanned once, not twice
    margins = cells.groupBy("feature", "v").agg(
        F.sum("c").cast("long").alias("m")
    )
    margins = apply_stages(margins, plog_stages("m", "_lm", "_g2_"))
    sv = margins.groupBy("feature").agg(
        F.sum(F.expr("CAST(ROUND(m * _lm * 1000000) AS BIGINT)")).alias(
            "sv"
        )
    )
    lang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("l"))
    lang = apply_stages(lang, plog_stages("l", "_ll", "_g3_"))
    sl = lang.agg(
        F.sum(F.expr("CAST(ROUND(l * _ll * 1000000) AS BIGINT)")).alias(
            "sl"
        )
    )
    tot = docs.agg(F.count(F.lit(1)).alias("n"))
    tot = apply_stages(tot, plog_stages("n", "_ln", "_g4_"))
    return (
        svl.join(sv, "feature")
        .crossJoin(F.broadcast(sl))
        .crossJoin(F.broadcast(tot.select("n", "_ln")))
        .selectExpr(
            "feature",
            "_ln - (CAST(sl AS DOUBLE) / CAST(1000000 AS DOUBLE))"
            " / CAST(n AS DOUBLE) AS h_lang",
            "((CAST(svl AS DOUBLE) / CAST(1000000 AS DOUBLE))"
            " / CAST(n AS DOUBLE)"
            " - (CAST(sv AS DOUBLE) / CAST(1000000 AS DOUBLE))"
            " / CAST(n AS DOUBLE))"
            " - ((CAST(sl AS DOUBLE) / CAST(1000000 AS DOUBLE))"
            " / CAST(n AS DOUBLE) - _ln) AS ig_nats",
        )
    )


# ---------------------------------------------------------------- Q19

_LO_SRC_A = "src0"
_LO_SRC_B = "src1"
_LO_TOPK = 15


def _lo_sql() -> str:
    per = f"""
    SELECT w,
           CAST(SUM(CASE WHEN source = '{_LO_SRC_A}' THEN 1 ELSE 0 END)
                AS BIGINT) AS a,
           CAST(SUM(CASE WHEN source = '{_LO_SRC_B}' THEN 1 ELSE 0 END)
                AS BIGINT) AS b
    FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS w
          FROM documents
          WHERE source IN ('{_LO_SRC_A}', '{_LO_SRC_B}'))
    GROUP BY 1
    """
    per = f"""
    SELECT p.w, p.a, p.b, t.aa, t.bb, t.v
    FROM ({per}) p
    CROSS JOIN (
        SELECT CAST(SUM(a) AS BIGINT) AS aa,
               CAST(SUM(b) AS BIGINT) AS bb,
               COUNT(*) AS v
        FROM ({per})
    ) t
    """
    for src, out, p in (
        ("a + 1", "_la", "_o1_"),
        ("aa + v - a - 1", "_lra", "_o2_"),
        ("b + 1", "_lb", "_o3_"),
        ("bb + v - b - 1", "_lrb", "_o4_"),
    ):
        per = sql_wrap_stages(per, plog_stages(src, out, p))
    z = (
        "((_la - _lra) - (_lb - _lrb))"
        " / sqrt(CAST(1 AS DOUBLE) / CAST(a + 1 AS DOUBLE)"
        " + CAST(1 AS DOUBLE) / CAST(b + 1 AS DOUBLE))"
    )
    scored = f"""
    SELECT w, a, b, ((_la - _lra) - (_lb - _lrb)) AS delta, {z} AS z
    FROM {per}
    """
    return f"""
    WITH scored AS ({scored})
    (SELECT '{_LO_SRC_A}' AS leans, w, a, b, delta, z FROM scored
     ORDER BY z DESC, w LIMIT {_LO_TOPK})
    UNION ALL
    (SELECT '{_LO_SRC_B}' AS leans, w, a, b, delta, z FROM scored
     ORDER BY z ASC, w LIMIT {_LO_TOPK})
    """


@query(
    "log_odds_dirichlet_terms",
    sql=_lo_sql(),
    tags=("llm", "infotheory", "textstats"),
)
def log_odds_dirichlet_terms(spark, sf_dir):
    """"Fightin' Words" (Monroe, Colaresi & Quinn 2008): the
    {k} most over-represented terms in each of two sources by
    Dirichlet-smoothed log-odds z-score — THE standard comparative-
    corpus keyword extractor (robust where raw ratio and chi2 both
    fail on rare words). Prior alpha = 1 per type, alpha0 = V.

    Exactness: delta = [ln(a+1) - ln(A+V-a-1)] - [ln(b+1) - ln(B+V-b-1)]
    is four portable lns of INTEGER arguments; the variance
    1/(a+1) + 1/(b+1) and the z division are identically-spelled IEEE
    ops; sqrt is correctly rounded. z is bitwise-equal, so both top
    slices cut identically (ties on the term).

    Scale shape: one filtered token scan to a per-type count table
    (conditional sums, no join), a broadcast one-row total, and two
    TakeOrdered top-{k}s.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.where(
        F.col("source").isin(_LO_SRC_A, _LO_SRC_B)
    ).select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    per = toks.groupBy("w").agg(
        F.sum(F.when(F.col("source") == _LO_SRC_A, 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("source") == _LO_SRC_B, 1).otherwise(0))
        .cast("long")
        .alias("b"),
    )
    tot = per.agg(
        F.sum("a").cast("long").alias("aa"),
        F.sum("b").cast("long").alias("bb"),
        F.count(F.lit(1)).alias("v"),
    )
    per = per.crossJoin(F.broadcast(tot))
    for src, out, p in (
        ("a + 1", "_la", "_o1_"),
        ("aa + v - a - 1", "_lra", "_o2_"),
        ("b + 1", "_lb", "_o3_"),
        ("bb + v - b - 1", "_lrb", "_o4_"),
    ):
        per = apply_stages(per, plog_stages(src, out, p))
    scored = per.selectExpr(
        "w",
        "a",
        "b",
        "((_la - _lra) - (_lb - _lrb)) AS delta",
        "((_la - _lra) - (_lb - _lrb))"
        " / sqrt(CAST(1 AS DOUBLE) / CAST(a + 1 AS DOUBLE)"
        " + CAST(1 AS DOUBLE) / CAST(b + 1 AS DOUBLE)) AS z",
    )
    top_a = (
        scored.orderBy(F.desc("z"), "w")
        .limit(_LO_TOPK)
        .selectExpr(f"'{_LO_SRC_A}' AS leans", "w", "a", "b", "delta", "z")
    )
    top_b = (
        scored.orderBy(F.asc("z"), "w")
        .limit(_LO_TOPK)
        .selectExpr(f"'{_LO_SRC_B}' AS leans", "w", "a", "b", "delta", "z")
    )
    return top_a.unionByName(top_b)


log_odds_dirichlet_terms.__doc__ = log_odds_dirichlet_terms.__doc__.format(
    k=_LO_TOPK
)


# ---------------------------------------------------------------- Q20

_AUC_Q = 10000  # score quantization: domain-bounded rank grid


@query(
    "auc_quality_langid",
    sql=f"""
    WITH stats AS ({_IG_STATS}),
    z AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
               CAST(ROUND((
                   (CAST(-2 AS DOUBLE) + CAST(0.5 AS DOUBLE)
                    * (CAST(n_tok AS DOUBLE) / CAST(100 AS DOUBLE)))
                   + (CAST(0.25 AS DOUBLE)
                      * (CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE))
                      - CAST(4 AS DOUBLE)
                      * (CAST(n_dig AS DOUBLE) / CAST(n_tok AS DOUBLE)))
               ) * {_AUC_Q}) AS BIGINT) AS q
        FROM stats
    ),
    vals AS (
        SELECT q, CAST(SUM(pos) AS BIGINT) AS n_p, COUNT(*) AS n_v
        FROM z GROUP BY q
    ),
    c AS (
        SELECT q, n_p, n_v,
               CAST(COALESCE(SUM(n_v) OVER (
                   ORDER BY q
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cumbefore
        FROM vals
    ),
    s AS (
        SELECT CAST(SUM(n_p) AS BIGINT) AS n1,
               CAST(SUM(n_v - n_p) AS BIGINT) AS n2,
               CAST(SUM(n_p * (2 * cumbefore + n_v + 1)) AS BIGINT)
                   AS r1_doubled
        FROM c
    )
    SELECT n1 AS n_pos, n2 AS n_neg,
           r1_doubled - n1 * (n1 + 1) AS u_doubled,
           CAST(r1_doubled - n1 * (n1 + 1) AS DOUBLE)
               / (CAST(2 AS DOUBLE) * CAST(n1 AS DOUBLE)
                  * CAST(n2 AS DOUBLE)) AS auc
    FROM s
    """,
    tags=("llm", "ml-eval", "stats"),
)
def auc_quality_langid(spark, sf_dir):
    """ROC AUC of the logistic quality score (infotheory2's feature
    formula) as an en-vs-rest classifier, through the Mann-Whitney
    identity AUC = U1/(n_pos * n_neg) — the threshold-free ranking
    eval that complements langid_f1_report's thresholded view.

    Exactness: the score is quantized to a {q}-per-unit integer grid
    (z is range-bounded by construction, so the grid is DOMAIN-sized,
    not data-sized); tie handling is exact doubled midranks on that
    grid (the mann_whitney_u convention), and AUC is one final
    division of exact integers.

    Scale shape: rank decomposition uses NO global data window — rows
    collapse to the per-quantile aggregate first; the cumulative runs
    over the bounded score grid (allowlisted class).
    """
    from pyspark.sql import Window as W

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
        f"""CAST(ROUND((
            (CAST(-2 AS DOUBLE) + CAST(0.5 AS DOUBLE)
             * (CAST(n_tok AS DOUBLE) / CAST(100 AS DOUBLE)))
            + (CAST(0.25 AS DOUBLE)
               * (CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE))
               - CAST(4 AS DOUBLE)
               * (CAST(n_dig AS DOUBLE) / CAST(n_tok AS DOUBLE)))
        ) * {_AUC_Q}) AS BIGINT) AS q""",
    )
    vals = z.groupBy("q").agg(
        F.sum("pos").cast("long").alias("n_p"),
        F.count(F.lit(1)).alias("n_v"),
    )
    w = (
        W.orderBy("q").rowsBetween(W.unboundedPreceding, -1)
    )
    c = vals.select(
        "q",
        "n_p",
        "n_v",
        F.coalesce(F.sum("n_v").over(w), F.lit(0))
        .cast("long")
        .alias("cumbefore"),
    )
    s = c.agg(
        F.sum("n_p").cast("long").alias("n1"),
        F.sum(F.col("n_v") - F.col("n_p")).cast("long").alias("n2"),
        F.sum(
            F.col("n_p") * (2 * F.col("cumbefore") + F.col("n_v") + 1)
        )
        .cast("long")
        .alias("r1_doubled"),
    )
    return s.selectExpr(
        "n1 AS n_pos",
        "n2 AS n_neg",
        "r1_doubled - n1 * (n1 + 1) AS u_doubled",
        "CAST(r1_doubled - n1 * (n1 + 1) AS DOUBLE)"
        " / (CAST(2 AS DOUBLE) * CAST(n1 AS DOUBLE)"
        " * CAST(n2 AS DOUBLE)) AS auc",
    )


auc_quality_langid.__doc__ = auc_quality_langid.__doc__.format(q=_AUC_Q)


# ---------------------------------------------------------------- Q21

_NDCG_K = 20


def _ndcg_sql() -> str:
    from tvbigdataproject_spark.queries.infotheory4 import (
        _BM25_TERMS,
        _bm25_piv_sql,
    )

    in_list = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    rel = f"""
    SELECT doc_id, COUNT(*) AS rel FROM
        (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
         FROM documents)
    WHERE term IN ({in_list}) GROUP BY 1
    """
    run = f"""
    SELECT r.doc_id, rel.rel, ROW_NUMBER() OVER (
               ORDER BY r.bm25 DESC, r.doc_id) AS i
    FROM (SELECT doc_id, bm25 FROM {_bm25_piv_sql()}
          ORDER BY bm25 DESC, doc_id LIMIT {_NDCG_K}) r
    JOIN ({rel}) rel ON r.doc_id = rel.doc_id
    """
    ideal = f"""
    SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS i
    FROM (SELECT doc_id, rel FROM ({rel})
          ORDER BY rel DESC, doc_id LIMIT {_NDCG_K})
    """
    run = sql_wrap_stages(f"({run})", plog_stages("i + 1", "_li", "_n1_"))
    ideal = sql_wrap_stages(
        f"({ideal})", plog_stages("i + 1", "_li", "_n2_")
    )
    return f"""
    WITH dcg AS (
        SELECT CAST(SUM(CAST(ROUND(CAST(rel AS DOUBLE) / _li
                                   * 1000000000) AS BIGINT)) AS BIGINT)
                   AS dcg_scaled
        FROM {run}
    ),
    idcg AS (
        SELECT CAST(SUM(CAST(ROUND(CAST(rel AS DOUBLE) / _li
                                   * 1000000000) AS BIGINT)) AS BIGINT)
                   AS idcg_scaled
        FROM {ideal}
    )
    SELECT CAST(dcg_scaled AS DOUBLE) / CAST(1000000000 AS DOUBLE)
               AS dcg_ln,
           CAST(idcg_scaled AS DOUBLE) / CAST(1000000000 AS DOUBLE)
               AS idcg_ln,
           CAST(dcg_scaled AS DOUBLE) / CAST(idcg_scaled AS DOUBLE)
               AS ndcg
    FROM dcg CROSS JOIN idcg
    """


@query(
    "ndcg_bm25_eval",
    sql=_ndcg_sql(),
    tags=("llm", "retrieval", "ml-eval", "infotheory"),
)
def ndcg_bm25_eval(spark, sf_dir):
    """NDCG@{k} of the BM25 (log-idf) run against graded relevance
    rel(d) = total query-term frequency — the standard ranking eval
    for any retrieval change (BM25 length normalization vs raw tf IS
    the disagreement being measured). Linear-gain NDCG with the
    ln(i + 1) discount (the 1/log2 discount differs by a constant
    factor, which cancels in the DCG/IDCG ratio).

    Exactness: discounts are portable lns of the INTEGER ranks i + 1;
    each list's 20 gains accumulate as scaled BIGINTs; ranks come from
    windows over the two TakeOrdered top-{k} candidate lists
    (rrf_fused_retrieval's allowlisted bounded class).

    Scale shape: rides bm25_log_topk's plan plus one term-count
    aggregate; both rank windows see {k} rows.
    """
    from pyspark.sql import Window as W

    from tvbigdataproject_spark.queries.infotheory4 import (
        _BM25_TERMS,
        _bm25_piv_df,
    )

    docs = read_table(spark, sf_dir, "documents")
    rel = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
        )
        .where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("rel"))
    )
    add = " + ".join(f"s_{t}" for t in _BM25_TERMS)
    top = (
        _bm25_piv_df(spark, sf_dir)
        .selectExpr("doc_id", f"{add} AS bm25")
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_NDCG_K)
    )
    run = top.join(rel, "doc_id").select(
        "rel",
        F.row_number()
        .over(W.orderBy(F.desc("bm25"), "doc_id"))
        .alias("i"),
    )
    ideal = (
        rel.orderBy(F.desc("rel"), "doc_id")
        .limit(_NDCG_K)
        .select(
            "rel",
            F.row_number()
            .over(W.orderBy(F.desc("rel"), "doc_id"))
            .alias("i"),
        )
    )
    run = apply_stages(run, plog_stages("i + 1", "_li", "_n1_"))
    ideal = apply_stages(ideal, plog_stages("i + 1", "_li", "_n2_"))
    gain = (
        "CAST(SUM(CAST(ROUND(CAST(rel AS DOUBLE) / _li * 1000000000)"
        " AS BIGINT)) AS BIGINT)"
    )
    dcg = run.agg(F.expr(f"{gain} AS dcg_scaled"))
    idcg = ideal.agg(F.expr(f"{gain} AS idcg_scaled"))
    return dcg.crossJoin(F.broadcast(idcg)).selectExpr(
        "CAST(dcg_scaled AS DOUBLE) / CAST(1000000000 AS DOUBLE)"
        " AS dcg_ln",
        "CAST(idcg_scaled AS DOUBLE) / CAST(1000000000 AS DOUBLE)"
        " AS idcg_ln",
        "CAST(dcg_scaled AS DOUBLE) / CAST(idcg_scaled AS DOUBLE)"
        " AS ndcg",
    )


ndcg_bm25_eval.__doc__ = ndcg_bm25_eval.__doc__.format(k=_NDCG_K)
