"""Portable-ln batch 2: the log-form operators the gate previously
substituted away, now oracle-exact.

- adamic_adar_linkpred     Adamic-Adar link prediction (1/ln deg) —
                           the log-weighted twin graph5.py's RA query
                           documented as "not exactly computable"
- dsir_importance_topk     DSIR data-selection importance weights
                           (Xie et al. 2023, arXiv:2302.03169): hashed
                           unigram log-likelihood ratio of a target
                           slice vs the raw corpus
- doc_log_perplexity_bigram  per-document mean negative log-likelihood
                           (nats) + perplexity under the corpus MLE
                           bigram LM — the true log form of
                           llm_ops10.py's monotone-substituted score
- logistic_quality_score   fixed-weight logistic quality classifier
                           (sigmoid via portable exp) — the fasttext-
                           style keep-probability scorer

Shared exactness contract: every transcendental comes from
functions/portable.py (bitwise-equal across engines); per-row terms
are rounded ONCE to scaled BIGINTs at a bounded table (degree table,
256-bucket table, bigram-type table) and all cross-row accumulation is
exact integer arithmetic.
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

# ---------------------------------------------------------------- Q4

_AA_MAX_DEGREE = 200  # same hub cap + rationale as graph5._RA_MAX_DEGREE
_AA_SCALE = 1 << 40


def _aa_sql() -> str:
    deg = sql_wrap_stages(
        f"""
        SELECT c, d FROM (
            SELECT c, COUNT(*) AS d FROM (
                SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            ) GROUP BY 1
        ) WHERE d BETWEEN 2 AND {_AA_MAX_DEGREE}
        """,
        plog_stages("d", "_ld", "_a1_"),
    )
    return f"""
    WITH e AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    deg AS (
        SELECT c, CAST(ROUND((CAST(1 AS DOUBLE) / _ld) * {_AA_SCALE})
                       AS BIGINT) AS w
        FROM {deg}
    ),
    pairs AS (
        SELECT a.s AS u, b.s AS v, deg.w AS w
        FROM e a JOIN e b ON a.c = b.c AND a.s < b.s
        JOIN deg ON deg.c = a.c
    ),
    scored AS (
        SELECT u, v, COUNT(*) AS common_customers,
               CAST(SUM(w) AS BIGINT) AS aa_scaled
        FROM pairs GROUP BY 1, 2
    )
    SELECT u AS u_suppkey, v AS v_suppkey, common_customers, aa_scaled,
           CAST(aa_scaled AS DOUBLE) / CAST({_AA_SCALE} AS DOUBLE)
               AS aa_score
    FROM scored
    ORDER BY aa_scaled DESC, u, v
    LIMIT 20
    """


@query(
    "adamic_adar_linkpred",
    sql=_aa_sql(),
    tags=("graph", "link-prediction", "infotheory"),
)
def adamic_adar_linkpred(spark, sf_dir):
    """Top-20 supplier pairs by the Adamic-Adar index through common
    customers: AA(u,v) = sum over common customers z of 1/ln(deg z) —
    the canonical log-damped common-neighbor score (Adamic & Adar
    2003), which graph5.py's RA query explicitly substituted away
    because ln was not bit-reproducible. The portable kernel closes
    that gap: 1/plog(deg) is bitwise-equal in both engines, rounded
    once to a 2^40-scaled BIGINT on the DEGREE TABLE (one row per
    customer, before the pair fan-out), so the pair aggregation is
    exact integer addition in any order.

    Scale shape: identical to ra_link_prediction — the self-join keys
    on the low-degree customer side, hubs past the cap are dropped
    before fan-out (deg >= 2 is also AA's domain: a degree-1 node is
    never a common neighbor), the degree join is co-partitioned on the
    same key, and the top-20 is a TakeOrdered.
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    e = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    deg = (
        e.groupBy("c")
        .agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d").between(2, _AA_MAX_DEGREE))
    )
    deg = apply_stages(deg, plog_stages("d", "_ld", "_a1_")).select(
        "c",
        F.expr(
            f"CAST(ROUND((CAST(1 AS DOUBLE) / _ld) * {_AA_SCALE})"
            " AS BIGINT)"
        ).alias("w"),
    )
    a = e.join(deg, "c")
    b = e.select("c", F.col("s").alias("s2"))
    pairs = a.join(b, "c").where(F.col("s") < F.col("s2"))
    scored = pairs.groupBy(
        F.col("s").alias("u_suppkey"), F.col("s2").alias("v_suppkey")
    ).agg(
        F.count(F.lit(1)).alias("common_customers"),
        F.sum("w").cast("long").alias("aa_scaled"),
    )
    return (
        scored.select(
            "u_suppkey",
            "v_suppkey",
            "common_customers",
            "aa_scaled",
            (
                F.col("aa_scaled").cast("double")
                / F.lit(_AA_SCALE).cast("double")
            ).alias("aa_score"),
        )
        .orderBy(F.desc("aa_scaled"), "u_suppkey", "v_suppkey")
        .limit(20)
    )


# ---------------------------------------------------------------- Q5

_DSIR_BUCKETS = 256
_DSIR_SCALE = 1 << 30
_DSIR_TARGET_LANG = "en"

# per-bucket log-likelihood ratio with add-one smoothing:
# lam_b = [ln(t_b + 1) - ln(T + B)] - [ln(s_b + 1) - ln(S + B)]
_DSIR_LAM = "(_ltb - _ltt) - (_lsb - _lst)"


def _dsir_sql() -> str:
    buckets = f"""
    SELECT s.b, s.s_b, COALESCE(t.t_b, 0) AS t_b, tot.s_n, tot.t_n
    FROM (
        SELECT ('0x' || substr(md5(w), 1, 4))::BIGINT % {_DSIR_BUCKETS}
                   AS b,
               COUNT(*) AS s_b
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
              FROM documents) GROUP BY 1
    ) s
    LEFT JOIN (
        SELECT ('0x' || substr(md5(w), 1, 4))::BIGINT % {_DSIR_BUCKETS}
                   AS b,
               COUNT(*) AS t_b
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
              FROM documents WHERE lang = '{_DSIR_TARGET_LANG}')
        GROUP BY 1
    ) t ON s.b = t.b
    CROSS JOIN (
        SELECT COUNT(*) AS s_n,
               SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0
                   END) AS t_n
        FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS w
              FROM documents)
    ) tot
    """
    for src, out, p in (
        ("t_b + 1", "_ltb", "_d1_"),
        (f"t_n + {_DSIR_BUCKETS}", "_ltt", "_d2_"),
        ("s_b + 1", "_lsb", "_d3_"),
        (f"s_n + {_DSIR_BUCKETS}", "_lst", "_d4_"),
    ):
        buckets = sql_wrap_stages(buckets, plog_stages(src, out, p))
    return f"""
    WITH lam AS (
        SELECT b, CAST(ROUND(({_DSIR_LAM}) * {_DSIR_SCALE}) AS BIGINT)
                      AS lam_scaled
        FROM {buckets}
    ),
    doc_toks AS (
        SELECT doc_id,
               ('0x' || substr(md5(w), 1, 4))::BIGINT % {_DSIR_BUCKETS}
                   AS b
        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
              FROM documents)
    )
    SELECT d.doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(lam.lam_scaled) AS BIGINT) AS w_scaled,
           CAST(SUM(lam.lam_scaled) AS DOUBLE)
               / CAST({_DSIR_SCALE} AS DOUBLE) AS log_importance
    FROM doc_toks d JOIN lam ON d.b = lam.b
    GROUP BY d.doc_id
    ORDER BY w_scaled DESC, d.doc_id
    LIMIT 50
    """


@query(
    "dsir_importance_topk",
    sql=_dsir_sql(),
    tags=("llm", "sampling", "infotheory"),
)
def dsir_importance_topk(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): score
    every raw document by the hashed-unigram log-likelihood ratio
    between a target slice (lang = 'en') and the raw corpus, and keep
    the top-50 — the importance-resampling recipe behind quality-
    targeted pretraining subsets, with add-one smoothing over 256 hash
    buckets.

    Exactness: bucket ids come from the suite's portable md5 hash;
    per-bucket lambda_b = ln((t_b+1)/(T+B)) - ln((s_b+1)/(S+B)) uses
    portable lns of INTEGER arguments and is rounded once to a
    2^30-scaled BIGINT on the 256-row bucket table; each document's
    log-importance is then an exact integer sum of its tokens' scaled
    lambdas. Ranking ties break on doc_id.

    Scale shape: two token scans (bucket histograms are 256-row
    aggregates), then one explode joined to the BROADCAST lambda table
    and a per-doc sum — no shuffle beyond the doc-keyed agg; the
    classifier table a real run would learn stays bucket-count-sized
    regardless of corpus size.
    """
    from tvbigdataproject_spark.functions.hashing import hex16_hash

    docs = read_table_spread(spark, sf_dir, "documents", "doc_id")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower("text"), " ")).alias("w"),
    )
    bucketed = toks.select(
        "doc_id",
        "lang",
        (hex16_hash(F.col("w")) % _DSIR_BUCKETS).alias("b"),
    )
    # one (bucket) aggregate carries both histograms (conditional sum),
    # and the totals are integer sums over its 256 rows — one token
    # scan for the whole classifier table, not three
    hist = bucketed.groupBy("b").agg(
        F.count(F.lit(1)).alias("s_b"),
        F.sum(
            F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("t_b"),
    )
    tot = hist.agg(
        F.sum("s_b").cast("long").alias("s_n"),
        F.sum("t_b").cast("long").alias("t_n"),
    )
    buckets = hist.crossJoin(F.broadcast(tot))
    for src, out, p in (
        ("t_b + 1", "_ltb", "_d1_"),
        (f"t_n + {_DSIR_BUCKETS}", "_ltt", "_d2_"),
        ("s_b + 1", "_lsb", "_d3_"),
        (f"s_n + {_DSIR_BUCKETS}", "_lst", "_d4_"),
    ):
        buckets = apply_stages(buckets, plog_stages(src, out, p))
    lam = buckets.select(
        "b",
        F.expr(
            f"CAST(ROUND(({_DSIR_LAM}) * {_DSIR_SCALE}) AS BIGINT)"
        ).alias("lam_scaled"),
    )
    return (
        bucketed.select("doc_id", "b")
        .join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lam_scaled").cast("long").alias("w_scaled"),
            (
                F.sum("lam_scaled").cast("double")
                / F.lit(_DSIR_SCALE).cast("double")
            ).alias("log_importance"),
        )
        .orderBy(F.desc("w_scaled"), "doc_id")
        .limit(50)
    )


# ---------------------------------------------------------------- Q6

_PPL_SCALE = 1 << 30


def _ppl_sql() -> str:
    lam = sql_wrap_stages(
        sql_wrap_stages(
            """
            SELECT cnt2.w1, cnt2.w2, cnt2.c2, cnt1.c1 FROM
                (SELECT w1, w2, COUNT(*) AS c2 FROM (
                    SELECT UNNEST(t[1:len(t) - 1]) AS w1,
                           UNNEST(t[2:len(t)]) AS w2
                    FROM (SELECT string_split(lower(text), ' ') AS t
                          FROM documents) WHERE len(t) >= 2
                 ) GROUP BY 1, 2) cnt2
                JOIN (SELECT w1, COUNT(*) AS c1 FROM (
                    SELECT UNNEST(t[1:len(t) - 1]) AS w1
                    FROM (SELECT string_split(lower(text), ' ') AS t
                          FROM documents) WHERE len(t) >= 2
                 ) GROUP BY 1) cnt1
                ON cnt2.w1 = cnt1.w1
            """,
            plog_stages("c1", "_l1", "_q1_"),
        ),
        plog_stages("c2", "_l2", "_q2_"),
    )
    inner = f"""
    WITH lam AS (
        SELECT w1, w2,
               CAST(ROUND((_l1 - _l2) * {_PPL_SCALE}) AS BIGINT)
                   AS nll_scaled
        FROM {lam}
    ),
    bg AS (
        SELECT doc_id,
               UNNEST(t[1:len(t) - 1]) AS w1,
               UNNEST(t[2:len(t)]) AS w2
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
              FROM documents) WHERE len(t) >= 2
    )
    SELECT bg.doc_id, COUNT(*) AS n_bigrams,
           (CAST(SUM(lam.nll_scaled) AS DOUBLE)
                / CAST({_PPL_SCALE} AS DOUBLE)) / COUNT(*) AS nll_nats
    FROM bg JOIN lam ON bg.w1 = lam.w1 AND bg.w2 = lam.w2
    GROUP BY bg.doc_id
    """
    out = sql_wrap_stages(inner, pexp_stages("nll_nats", "ppl", "_e1_"))
    return f"SELECT doc_id, n_bigrams, nll_nats, ppl FROM {out}"


@query(
    "doc_log_perplexity_bigram",
    sql=_ppl_sql(),
    tags=("llm", "lm", "quality", "infotheory"),
)
def doc_log_perplexity_bigram(spark, sf_dir):
    """Per-document mean negative log-likelihood (nats) and perplexity
    under the corpus MLE bigram model — the actual KenLM-style quality
    filter signal. llm_ops10.py::lm_bigram_doc_scores shipped the
    monotone SUBSTITUTE (scaled linear probabilities) because ln was
    not bit-reproducible; this is the true log form on the portable
    kernel, so perplexity thresholds from the literature apply as-is.

    Exactness: nll(w1 w2) = ln c1(w1) - ln c2(w1, w2) on integer
    counts, rounded once to a 2^30-scaled BIGINT on the bigram-TYPE
    table; each doc's total is an exact integer sum over its bigram
    instances, and ppl = pexp(mean) goes through the exp kernel.

    Scale shape: bigram types aggregate map-side; the instance-to-type
    join keys on (w1, w2) — the same equi-join shape as the
    substituted query — and the per-doc agg is one keyed shuffle.
    """
    docs = read_table_spread(spark, sf_dir, "documents", "doc_id")
    t = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("t")
    ).where(F.size("t") >= 2)
    bg = t.select(
        "doc_id",
        F.expr("slice(t, 1, size(t) - 1)").alias("w1s"),
        F.expr("slice(t, 2, size(t) - 1)").alias("w2s"),
    ).select(
        "doc_id",
        F.explode(F.arrays_zip("w1s", "w2s")).alias("z"),
    ).select(
        "doc_id", F.col("z.w1s").alias("w1"), F.col("z.w2s").alias("w2")
    )
    # c1(w1) = sum_w2 c2(w1, w2): the unigram margin derives from the
    # bigram-type aggregate — one corpus explode, not two
    cnt2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    cnt1 = cnt2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    lam = cnt2.join(cnt1, "w1")
    lam = apply_stages(lam, plog_stages("c1", "_l1", "_q1_"))
    lam = apply_stages(lam, plog_stages("c2", "_l2", "_q2_"))
    lam = lam.select(
        "w1",
        "w2",
        F.expr(
            f"CAST(ROUND((_l1 - _l2) * {_PPL_SCALE}) AS BIGINT)"
        ).alias("nll_scaled"),
    )
    per = (
        bg.join(lam, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr(
                f"(CAST(SUM(nll_scaled) AS DOUBLE)"
                f" / CAST({_PPL_SCALE} AS DOUBLE)) / COUNT(*)"
            ).alias("nll_nats"),
        )
    )
    per = apply_stages(per, pexp_stages("nll_nats", "ppl", "_e1_"))
    return per.select("doc_id", "n_bigrams", "nll_nats", "ppl")


# ---------------------------------------------------------------- Q7

# dyadic logistic weights (exactly representable doubles): the scorer a
# production pipeline would FIT offline and apply at scale; weights are
# the apply-side artifact, like the recorded centroids in the IVF tier
_LQ_Z = (
    "(CAST(-2 AS DOUBLE) + CAST(0.5 AS DOUBLE) * f_len)"
    " + (CAST(0.25 AS DOUBLE) * f_wlen"
    " - CAST(4 AS DOUBLE) * f_digit)"
)

_LQ_FEATS = """
    SELECT doc_id,
           CAST(n_tok AS DOUBLE) / CAST(100 AS DOUBLE) AS f_len,
           CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE) AS f_wlen,
           CAST(n_dig AS DOUBLE) / CAST(n_tok AS DOUBLE) AS f_digit
    FROM {inner}
"""


def _lq_sql() -> str:
    inner = """
    (SELECT doc_id, COUNT(*) AS n_tok,
            CAST(SUM(length(w)) AS BIGINT) AS n_chr,
            SUM(CASE WHEN regexp_matches(w, '[0-9]') THEN 1 ELSE 0 END)
                AS n_dig
     FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
           FROM documents)
     GROUP BY 1)
    """
    feats = _LQ_FEATS.format(inner=inner)
    z = f"SELECT doc_id, f_len, f_wlen, f_digit, {_LQ_Z} AS z FROM ({feats})"
    p = sql_wrap_stages(z, pexp_stages("CAST(0 AS DOUBLE) - z", "_enz", "_e1_"))
    return f"""
    SELECT doc_id, z,
           CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + _enz) AS p_keep
    FROM {p}
    ORDER BY p_keep DESC, doc_id
    LIMIT 100
    """


@query(
    "logistic_quality_score",
    sql=_lq_sql(),
    tags=("llm", "quality", "infotheory"),
)
def logistic_quality_score(spark, sf_dir):
    """Fixed-weight logistic quality classifier over cheap text
    features (token count, mean word length, digit-token ratio):
    p_keep = sigmoid(w . f) — the fasttext-style keep-probability
    scorer every CCNet-descended pipeline applies corpus-wide, with
    the sigmoid's exp from the portable kernel so the probability
    itself (not just the ranking) is oracle-checked. Top-100 by
    p_keep, ties on doc_id.

    Exactness: features are ratios of exact integer token statistics
    (one rounded division each, identical text both engines); the
    dyadic weights make z a fixed sequence of exact products and
    rounded adds; sigmoid = 1/(1 + pexp(-z)).

    Scale shape: one explode + per-doc aggregate; the scorer is a
    scalar expression in codegen (no UDF), so it costs a scan —
    exactly what a keep/drop pass should cost at 100 TB.
    """
    docs = read_table(spark, sf_dir, "documents")
    stats = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(F.length("w")).cast("long").alias("n_chr"),
            F.sum(
                F.when(F.col("w").rlike("[0-9]"), 1).otherwise(0)
            ).alias("n_dig"),
        )
    )
    feats = stats.selectExpr(
        "doc_id",
        "CAST(n_tok AS DOUBLE) / CAST(100 AS DOUBLE) AS f_len",
        "CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE) AS f_wlen",
        "CAST(n_dig AS DOUBLE) / CAST(n_tok AS DOUBLE) AS f_digit",
    )
    z = feats.selectExpr(
        "doc_id", "f_len", "f_wlen", "f_digit", f"{_LQ_Z} AS z"
    )
    p = apply_stages(
        z, pexp_stages("CAST(0 AS DOUBLE) - z", "_enz", "_e1_")
    )
    return (
        p.selectExpr(
            "doc_id",
            "z",
            "CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + _enz) AS p_keep",
        )
        .orderBy(F.desc("p_keep"), "doc_id")
        .limit(100)
    )
