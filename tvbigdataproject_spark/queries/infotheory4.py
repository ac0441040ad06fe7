"""Portable-ln batch 4: true log forms of the suite's documented
monotone substitutes, plus the log-keyed sampling family.

- tfidf_log_topk        tf * ln(N/df) — the textbook idf;
                        llm_ops.py::tfidf_top_terms ships the linear
                        N/df substitute (rank-safe per-term, but the
                        SCORES and cross-term comparisons differ)
- bm25_log_topk         BM25 with the real log idf
                        ln((N - df + 0.5)/(df + 0.5)) — llm_ops9.py
                        substituted linear idf for the same reason
- pmi_collocations      top bigrams by pointwise mutual information
                        (+ normalized PMI) — the classic collocation
                        extractor, pure log-ratio of integer counts
- es_weighted_sample    Efraimidis-Spirakis weighted sampling without
                        replacement via the log key ln(u)/w —
                        llm_ops4's priority sample uses the monotone
                        integer substitute; this is the real key whose
                        VALUE is theory-grade (exponential races)
- softmax_temperature_weights  n^(1/T) mixture re-weighting (T = 3)
                        through exp(ln(n)/T) — the general-temperature
                        form of mixture_temperature_sample's T = 2
                        sqrt trick

Every transcendental is the portable kernel on INTEGER arguments;
scores are per-row doubles (bitwise-equal across engines), so even
ORDER BY ties resolve identically; accumulated sums use scaled-BIGINT
stable accumulation.
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

# ---------------------------------------------------------------- Q13


def _tfidf_sql() -> str:
    scored = """
    SELECT tf.doc_id, tf.term, tf.tf, df.df, n.n_docs FROM
        (SELECT doc_id, term, COUNT(*) AS tf FROM
            (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
             FROM documents) GROUP BY 1, 2) tf
        JOIN (SELECT term, COUNT(*) AS df FROM
            (SELECT DISTINCT doc_id, term FROM
                (SELECT doc_id, unnest(string_split(lower(text), ' '))
                     AS term FROM documents)) GROUP BY 1) df
            ON tf.term = df.term
        CROSS JOIN (SELECT COUNT(*) AS n_docs FROM documents) n
    """
    scored = sql_wrap_stages(scored, plog_stages("n_docs", "_ln", "_f1_"))
    scored = sql_wrap_stages(scored, plog_stages("df", "_ld", "_f2_"))
    return f"""
    SELECT doc_id, term, score, rnk FROM (
        SELECT doc_id, term,
               CAST(tf AS DOUBLE) * (_ln - _ld) AS score,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY
                   CAST(tf AS DOUBLE) * (_ln - _ld) DESC, term
               ) AS rnk
        FROM {scored}
    ) WHERE rnk <= 3
    """


@query(
    "tfidf_log_topk",
    sql=_tfidf_sql(),
    tags=("llm", "tfidf", "infotheory"),
)
def tfidf_log_topk(spark, sf_dir):
    """Top-3 salient terms per document under the TEXTBOOK tf-idf,
    tf * ln(N/df). tfidf_top_terms documents why it shipped the linear
    N/df substitute (per-term rank-safe, but scores and any cross-term
    arithmetic differ); the portable kernel makes the real statistic
    oracle-exact — scores are bitwise-equal doubles, so the ranking
    window's ordering (and its ties) is identical in both engines.

    Scale shape: identical to tfidf_top_terms — two keyed aggregates,
    a term-keyed join, broadcast one-row corpus count, and a per-doc
    rank window (partitioned by doc_id — never global).
    """
    from pyspark.sql import Window as W

    docs = read_table_spread(spark, sf_dir, "documents", "doc_id")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.join(df, "term").crossJoin(F.broadcast(n))
    scored = apply_stages(scored, plog_stages("n_docs", "_ln", "_f1_"))
    scored = apply_stages(scored, plog_stages("df", "_ld", "_f2_"))
    scored = scored.select(
        "doc_id",
        "term",
        F.expr("CAST(tf AS DOUBLE) * (_ln - _ld)").alias("score"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.select(
            "doc_id", "term", "score", F.row_number().over(w).alias("rnk")
        ).where(F.col("rnk") <= 3)
    )


# ---------------------------------------------------------------- Q14

_BM25_TERMS = ("vector", "hash", "scan")  # llm_ops9 fixed lexical query


def _bm25_piv_sql() -> str:
    """DuckDB SQL for the per-doc pivoted BM25 (log idf) score table
    (doc_id, s_<term>...) — shared by bm25_log_topk and the NDCG eval."""
    in_list = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    per = f"""
    SELECT qtf.doc_id, qtf.term, qtf.tf, dl.dl, df.df, st.n_docs, st.tot
    FROM
        (SELECT doc_id, term, COUNT(*) AS tf FROM
            (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
             FROM documents)
         WHERE term IN ({in_list}) GROUP BY 1, 2) qtf
        JOIN (SELECT doc_id, COUNT(*) AS dl FROM
            (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
             FROM documents) GROUP BY 1) dl ON qtf.doc_id = dl.doc_id
        JOIN (SELECT term, COUNT(DISTINCT doc_id) AS df FROM
            (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
             FROM documents)
         WHERE term IN ({in_list}) GROUP BY 1) df ON qtf.term = df.term
        CROSS JOIN (
            SELECT COUNT(*) AS n_docs,
                   (SELECT COUNT(*) FROM
                       (SELECT unnest(string_split(lower(text), ' '))
                            AS term FROM documents)) AS tot
            FROM documents) st
    """
    # idf = ln((N - df + 0.5)/(df + 0.5)) via doubled-integer arguments
    per = sql_wrap_stages(
        per, plog_stages("2 * (n_docs - df) + 1", "_lnum", "_b1_")
    )
    per = sql_wrap_stages(per, plog_stages("2 * df + 1", "_lden", "_b2_"))
    score = (
        "(_lnum - _lden) * (CAST(tf AS DOUBLE) * CAST(2.25 AS DOUBLE))"
        " / (CAST(tf AS DOUBLE) + CAST(1.25 AS DOUBLE)"
        " * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)"
        " * (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)"
        " / CAST(tot AS DOUBLE))))"
    )
    pivot = ",\n           ".join(
        f"COALESCE(MAX(CASE WHEN term = '{t}' THEN score END),"
        f" CAST(0 AS DOUBLE)) AS s_{t}"
        for t in _BM25_TERMS
    )
    add = " + ".join(f"s_{t}" for t in _BM25_TERMS)
    return f"""
    (SELECT doc_id, {add} AS bm25 FROM (
        SELECT doc_id,
           {pivot}
        FROM (SELECT doc_id, term, {score} AS score FROM {per})
        GROUP BY doc_id
    ))
    """


def _bm25_sql() -> str:
    return f"""
    SELECT doc_id, bm25 FROM {_bm25_piv_sql()}
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """


@query(
    "bm25_log_topk",
    sql=_bm25_sql(),
    tags=("llm", "retrieval", "infotheory"),
)
def bm25_log_topk(spark, sf_dir):
    """Top-20 documents for the fixed 3-term query under REAL BM25 —
    idf = ln((N - df + 0.5)/(df + 0.5)) — where llm_ops9's bm25_topk
    documents its linear-idf substitution. The half-integer arguments
    become the integer products 2(N - df) + 1 and 2df + 1, so both lns
    are portable-kernel on integers; k1/b stay the dyadic 1.25/0.75
    and the multi-term sum is the fixed-order pivot (a float SUM would
    be order-dependent).

    Scale shape: llm_ops9's — the rare-term tf table is tiny, doc
    length joins on doc_id, the corpus stats broadcast, and the top-20
    is a TakeOrdered.
    """
    piv = _bm25_piv_df(spark, sf_dir)
    add = " + ".join(f"s_{t}" for t in _BM25_TERMS)
    return (
        piv.selectExpr("doc_id", f"{add} AS bm25")
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


def _bm25_piv_df(spark, sf_dir):
    """Spark twin of _bm25_piv_sql: per-doc pivoted BM25 scores."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    qtf = (
        toks.where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    # df and both corpus totals derive from the qtf / dl aggregates —
    # two corpus passes (the filtered tf scan and the length scan)
    dfr = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    st = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("tot"),
    )
    per = (
        qtf.join(dl, "doc_id")
        .join(F.broadcast(dfr), "term")
        .crossJoin(F.broadcast(st))
    )
    per = apply_stages(
        per, plog_stages("2 * (n_docs - df) + 1", "_lnum", "_b1_")
    )
    per = apply_stages(per, plog_stages("2 * df + 1", "_lden", "_b2_"))
    scored = per.selectExpr(
        "doc_id",
        "term",
        "(_lnum - _lden) * (CAST(tf AS DOUBLE) * CAST(2.25 AS DOUBLE))"
        " / (CAST(tf AS DOUBLE) + CAST(1.25 AS DOUBLE)"
        " * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)"
        " * (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)"
        " / CAST(tot AS DOUBLE)))) AS score",
    )
    return scored.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("score"))),
                F.expr("CAST(0 AS DOUBLE)"),
            ).alias(f"s_{t}")
            for t in _BM25_TERMS
        ]
    )


# ---------------------------------------------------------------- Q15

_PMI_MIN_COUNT = 5


def _pmi_sql() -> str:
    per = f"""
    SELECT c2.w1, c2.w2, c2.c2, ca.ca, cb.cb, t.n FROM
        (SELECT w1, w2, COUNT(*) AS c2 FROM (
            SELECT UNNEST(t[1:len(t) - 1]) AS w1,
                   UNNEST(t[2:len(t)]) AS w2
            FROM (SELECT string_split(lower(text), ' ') AS t
                  FROM documents) WHERE len(t) >= 2
         ) GROUP BY 1, 2 HAVING COUNT(*) >= {_PMI_MIN_COUNT}) c2
        JOIN (SELECT w1, COUNT(*) AS ca FROM (
            SELECT UNNEST(t[1:len(t) - 1]) AS w1
            FROM (SELECT string_split(lower(text), ' ') AS t
                  FROM documents) WHERE len(t) >= 2
         ) GROUP BY 1) ca ON c2.w1 = ca.w1
        JOIN (SELECT w2, COUNT(*) AS cb FROM (
            SELECT UNNEST(t[2:len(t)]) AS w2
            FROM (SELECT string_split(lower(text), ' ') AS t
                  FROM documents) WHERE len(t) >= 2
         ) GROUP BY 1) cb ON c2.w2 = cb.w2
        CROSS JOIN (SELECT COUNT(*) AS n FROM (
            SELECT UNNEST(t[1:len(t) - 1]) AS w1
            FROM (SELECT string_split(lower(text), ' ') AS t
                  FROM documents) WHERE len(t) >= 2)) t
    """
    for src, out, p in (
        ("c2", "_l2", "_p1_"),
        ("ca", "_la", "_p2_"),
        ("cb", "_lb", "_p3_"),
        ("n", "_ln", "_p4_"),
    ):
        per = sql_wrap_stages(per, plog_stages(src, out, p))
    return f"""
    SELECT w1, w2, c2, ca, cb,
           (_l2 + _ln) - (_la + _lb) AS pmi,
           ((_l2 + _ln) - (_la + _lb)) / (_ln - _l2) AS npmi
    FROM {per}
    ORDER BY pmi DESC, w1, w2
    LIMIT 30
    """


@query(
    "pmi_collocations",
    sql=_pmi_sql(),
    tags=("llm", "ngram", "infotheory"),
)
def pmi_collocations(spark, sf_dir):
    """Top-30 collocations by pointwise mutual information over corpus
    bigrams (count >= {min_count}), with normalized PMI — the standard
    phrase-mining scorer (word2vec-style phrase joining, stopword-
    robust unlike raw counts; complements bigram_lift's lift form with
    the log form the literature quotes thresholds in).

    Exactness: pmi = ln c2 + ln N - ln ca - ln cb on exact integer
    counts (first-position/second-position margins, matching the MLE
    bigram convention), every ln portable; npmi divides two agreed
    doubles. Scores are bitwise-equal, so the top-30 cut is identical.

    Scale shape: bigram/margin tables aggregate map-side; two
    token-keyed joins + a broadcast total; top-30 is a TakeOrdered.
    """
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(F.split(F.lower("text"), " ").alias("t")).where(
        F.size("t") >= 2
    )
    bg = (
        t.select(
            F.expr("slice(t, 1, size(t) - 1)").alias("w1s"),
            F.expr("slice(t, 2, size(t) - 1)").alias("w2s"),
        )
        .select(F.explode(F.arrays_zip("w1s", "w2s")).alias("z"))
        .select(F.col("z.w1s").alias("w1"), F.col("z.w2s").alias("w2"))
    )
    # margins and the total derive from the UNFILTERED bigram-type
    # aggregate (one corpus explode; its identical exchange plans once)
    c2_all = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c2 = c2_all.where(F.col("c2") >= _PMI_MIN_COUNT)
    ca = c2_all.groupBy("w1").agg(F.sum("c2").cast("long").alias("ca"))
    cb = c2_all.groupBy("w2").agg(F.sum("c2").cast("long").alias("cb"))
    n = c2_all.agg(F.sum("c2").cast("long").alias("n"))
    per = c2.join(ca, "w1").join(cb, "w2").crossJoin(F.broadcast(n))
    for src, out, p in (
        ("c2", "_l2", "_p1_"),
        ("ca", "_la", "_p2_"),
        ("cb", "_lb", "_p3_"),
        ("n", "_ln", "_p4_"),
    ):
        per = apply_stages(per, plog_stages(src, out, p))
    return (
        per.selectExpr(
            "w1",
            "w2",
            "c2",
            "ca",
            "cb",
            "(_l2 + _ln) - (_la + _lb) AS pmi",
            "((_l2 + _ln) - (_la + _lb)) / (_ln - _l2) AS npmi",
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(30)
    )


pmi_collocations.__doc__ = pmi_collocations.__doc__.format(
    min_count=_PMI_MIN_COUNT
)


# ---------------------------------------------------------------- Q16

_ES_K = 32


def _es_sql() -> str:
    per = """
    SELECT doc_id, n_chars,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
               AS h
    FROM documents
    """
    per = sql_wrap_stages(per, plog_stages("h + 1", "_lh", "_s1_"))
    return f"""
    SELECT doc_id, n_chars,
           (_lh - CAST(11.090354888959125 AS DOUBLE))
               / CAST(n_chars AS DOUBLE) AS ln_key
    FROM {per}
    ORDER BY ln_key DESC, doc_id
    LIMIT {_ES_K}
    """


@query(
    "es_weighted_sample",
    sql=_es_sql(),
    tags=("llm", "sampling", "infotheory"),
)
def es_weighted_sample(spark, sf_dir):
    """Weighted sampling WITHOUT replacement, Efraimidis-Spirakis
    (2006): each document draws u = (h+1)/65536 from the portable md5
    hash and keeps key u^(1/w) with w = n_chars; the top-{k} keys ARE
    a w-weighted sample without replacement (the exponential-race
    argument needs the true log key, which is why llm_ops4's priority
    sample shipped a monotone integer substitute). Computed in log
    space: ln_key = (ln(h+1) - ln 65536)/w (u in (0, 1], the max-hash
    doc carrying ln_key = 0 exactly), with ln(h+1) portable and
    ln 65536 a shared 17-digit constant (both engines round the same
    decimal to the same double).

    Scale shape: a scan-local score + TakeOrdered top-{k} — the
    cheapest possible distributed weighted sampler.
    """
    from tvbigdataproject_spark.functions.hashing import hex16_hash

    docs = read_table(spark, sf_dir, "documents")
    per = docs.select(
        "doc_id",
        "n_chars",
        hex16_hash(F.col("doc_id").cast("string")).alias("h"),
    )
    per = apply_stages(per, plog_stages("h + 1", "_lh", "_s1_"))
    return (
        per.selectExpr(
            "doc_id",
            "n_chars",
            "(_lh - CAST(11.090354888959125 AS DOUBLE))"
            " / CAST(n_chars AS DOUBLE) AS ln_key",
        )
        .orderBy(F.desc("ln_key"), "doc_id")
        .limit(_ES_K)
    )


es_weighted_sample.__doc__ = es_weighted_sample.__doc__.format(k=_ES_K)


# ---------------------------------------------------------------- Q17

_SOFTMAX_T = 3


def _softmax_sql() -> str:
    per = """
    SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2
    """
    per = sql_wrap_stages(per, plog_stages("n", "_ln", "_x1_"))
    per = sql_wrap_stages(
        per,
        pexp_stages(
            f"_ln / CAST({_SOFTMAX_T} AS DOUBLE)", "w_unnorm", "_x2_"
        ),
    )
    return f"""
    WITH w AS (
        SELECT lang, source, n, w_unnorm,
               CAST(ROUND(w_unnorm * 1000000000) AS BIGINT) AS w_scaled
        FROM {per}
    ),
    tot AS (
        SELECT lang, CAST(SUM(w_scaled) AS BIGINT) AS tw FROM w
        GROUP BY 1
    )
    SELECT w.lang, w.source, w.n, w.w_unnorm,
           CAST(w.w_scaled AS DOUBLE) / CAST(tot.tw AS DOUBLE) AS share
    FROM w JOIN tot ON w.lang = tot.lang
    """


@query(
    "softmax_temperature_weights",
    sql=_softmax_sql(),
    tags=("llm", "mixture", "sampling", "infotheory"),
)
def softmax_temperature_weights(spark, sf_dir):
    """General-temperature mixture re-weighting: within each language,
    source s gets weight n_s^(1/T) (T = {t}) normalized to shares —
    the mT5/PaLM domain-flattening at an arbitrary temperature.
    mixture_temperature_sample hard-codes T = 2 because sqrt is the
    one exactly-computable power; exp(ln(n)/T) through the portable
    kernel unlocks any T.

    Exactness: n^(1/T) = pexp(plog(n)/T) is bitwise-equal per row; the
    per-language normalizer sums the weights as ROUND(w * 1e9) BIGINTs
    (order-free), and each share is one division of agreed values.

    Scale shape: one keyed count to the bounded (lang x source) table;
    everything after is label-cardinality-sized.
    """
    docs = read_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n")
    )
    per = apply_stages(per, plog_stages("n", "_ln", "_x1_"))
    per = apply_stages(
        per,
        pexp_stages(
            f"_ln / CAST({_SOFTMAX_T} AS DOUBLE)", "w_unnorm", "_x2_"
        ),
    )
    w = per.select(
        "lang",
        "source",
        "n",
        "w_unnorm",
        F.expr("CAST(ROUND(w_unnorm * 1000000000) AS BIGINT)").alias(
            "w_scaled"
        ),
    )
    tot = w.groupBy("lang").agg(
        F.sum("w_scaled").cast("long").alias("tw")
    )
    return w.join(F.broadcast(tot), "lang").select(
        "lang",
        "source",
        "n",
        "w_unnorm",
        (F.col("w_scaled").cast("double") / F.col("tw").cast("double"))
        .alias("share"),
    )


softmax_temperature_weights.__doc__ = (
    softmax_temperature_weights.__doc__.format(t=_SOFTMAX_T)
)
