"""Round-9 LLM-ops additions: corpus-slice divergence (Hellinger),
labeler evaluation (per-class F1), and positional phrase search —
three production questions over the documents table that round out the
evaluation/retrieval tier.

Exactness conventions as everywhere: integer counts, integer-ppm
rationals, FLOOR over IEEE-correctly-rounded sqrt (never ROUND on a
double — the engines' double-rounding rules differ), and at most one
final double expression per column.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# bounded source slice for the pairwise profile comparison (20 sources
# -> 190 pairs is still bounded, but 5 keeps the oracle light and the
# output reviewable; the plan is identical at any slice size)
_HELL_SOURCES = ("src0", "src1", "src2", "src3", "src4")


@query(
    "hellinger_source_profiles",
    sql=f"""
    WITH tok AS (
        SELECT source, unnest(string_split(lower(text), ' ')) AS t
        FROM documents WHERE source IN {_HELL_SOURCES!r}
    ),
    cnt AS (SELECT source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
    pair_terms AS (
        SELECT a.source AS sa, b.source AS sb,
               CAST(SUM(CAST(FLOOR(SQRT(CAST(a.c AS DOUBLE)
                                        * CAST(b.c AS DOUBLE)) * 1000.0)
                             AS BIGINT)) AS BIGINT) AS s_scaled,
               COUNT(*) AS shared_terms
        FROM cnt a JOIN cnt b ON a.t = b.t AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT p.sa, p.sb, p.shared_terms, ta.n AS na, tb.n AS nb, p.s_scaled,
           CAST(p.s_scaled AS DOUBLE)
               / (1000.0 * SQRT(CAST(ta.n AS DOUBLE) * CAST(tb.n AS DOUBLE)))
               AS bc,
           SQRT(1.0 - CAST(p.s_scaled AS DOUBLE)
                / (1000.0 * SQRT(CAST(ta.n AS DOUBLE) * CAST(tb.n AS DOUBLE))))
               AS hellinger
    FROM pair_terms p
    JOIN tot ta ON ta.source = p.sa
    JOIN tot tb ON tb.source = p.sb
    """,
    tags=("llm", "divergence", "mixture"),
)
def hellinger_source_profiles(spark, sf_dir):
    """Pairwise Hellinger distance between source unigram profiles —
    the bounded-[0,1] divergence a mixture designer reads before
    merging or re-weighting corpus slices (unlike KL it is symmetric,
    defined on disjoint supports, and needs no smoothing).

    Exactness: the Bhattacharyya coefficient's per-term sqrt(p*q)
    accumulates as FLOOR(sqrt(a*b)*1000) — an exact BIGINT sum of
    deterministically-rounded terms (sqrt is IEEE correctly-rounded;
    FLOOR of a double is exact; ROUND is avoided because the engines'
    double-rounding disagrees at boundaries). The floor makes S a
    certified UNDERestimate, so 1 - bc >= 0 by Cauchy-Schwarz and the
    final sqrt is always defined. Zero-overlap terms vanish via the
    inner join.

    Scale shape: one token-count shuffle, then a token-keyed equi-join
    between per-source count tables — vocabulary-sized, never
    corpus-sized; totals attach by a bounded broadcast.
    """
    docs = read_table(spark, sf_dir, "documents").where(
        F.col("source").isin(*_HELL_SOURCES)
    )
    cnt = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("t"),
        )
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    a = cnt.select(
        F.col("source").alias("sa"), "t", F.col("c").alias("ca")
    )
    b = cnt.select(
        F.col("source").alias("sb"), "t", F.col("c").alias("cb")
    )
    pair_terms = (
        a.join(b, "t")
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(
            F.sum(
                F.floor(
                    F.sqrt(
                        F.col("ca").cast("double") * F.col("cb").cast("double")
                    )
                    * 1000.0
                ).cast("long")
            ).cast("long").alias("s_scaled"),
            F.count(F.lit(1)).alias("shared_terms"),
        )
    )
    ta = tot.select(F.col("source").alias("sa"), F.col("n").alias("na"))
    tb = tot.select(F.col("source").alias("sb"), F.col("n").alias("nb"))
    bc = F.col("s_scaled").cast("double") / (
        1000.0
        * F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
    )
    return (
        pair_terms.join(F.broadcast(ta), "sa")
        .join(F.broadcast(tb), "sb")
        .select(
            "sa",
            "sb",
            "shared_terms",
            "na",
            "nb",
            "s_scaled",
            bc.alias("bc"),
            F.sqrt(1.0 - bc).alias("hellinger"),
        )
    )


def _f1_sql() -> str:
    from tvbigdataproject_spark.queries.textstats import _langid_sql

    return f"""
    WITH pred AS (
        SELECT p.doc_id, p.predicted_lang AS pl, d.lang AS gl
        FROM ({_langid_sql()}) p JOIN documents d ON p.doc_id = d.doc_id
    ),
    pc AS (SELECT pl AS cls, COUNT(*) AS np FROM pred GROUP BY 1),
    gc AS (SELECT gl AS cls, COUNT(*) AS ng FROM pred GROUP BY 1),
    diag AS (
        SELECT pl AS cls, COUNT(*) AS tp FROM pred WHERE pl = gl GROUP BY 1
    )
    SELECT cls,
           CAST(COALESCE(d.tp, 0) AS BIGINT) AS tp,
           CAST(COALESCE(pc.np, 0) - COALESCE(d.tp, 0) AS BIGINT) AS fp,
           CAST(COALESCE(gc.ng, 0) - COALESCE(d.tp, 0) AS BIGINT) AS fn,
           CASE WHEN COALESCE(pc.np, 0) > 0
                THEN 1000000 * COALESCE(d.tp, 0) // pc.np END
               AS precision_ppm,
           CASE WHEN COALESCE(gc.ng, 0) > 0
                THEN 1000000 * COALESCE(d.tp, 0) // gc.ng END
               AS recall_ppm,
           CASE WHEN COALESCE(pc.np, 0) + COALESCE(gc.ng, 0) > 0
                THEN 2000000 * COALESCE(d.tp, 0)
                     // (COALESCE(pc.np, 0) + COALESCE(gc.ng, 0)) END
               AS f1_ppm
    FROM pc FULL OUTER JOIN gc USING (cls)
    LEFT JOIN diag d USING (cls)
    """


@query("langid_f1_report", sql=_f1_sql(), tags=("llm", "evaluation", "langid"))
def langid_f1_report(spark, sf_dir):
    """Per-class precision / recall / F1 of the heuristic language-ID
    labeler against the recorded gold label — the class-level
    evaluation cohen_kappa_langid summarizes to one number (a labeler
    can hold a decent kappa while silently never predicting one class;
    this report is where that shows).

    Exactness: tp/fp/fn are exact counts; precision, recall and F1 are
    integer parts-per-million (2e6*tp // (np+ng) for F1 — the harmonic
    mean's 2PR/(P+R) rewritten over raw counts so no float division
    chains). Classes the labeler never predicts surface with NULL
    precision rather than a fabricated 0/0.

    Scale shape: the langid scan (one pass), a doc_id-keyed join for
    the gold label, then bounded class-set margins.
    """
    from tvbigdataproject_spark.queries.textstats import text_langid

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    pred = (
        text_langid(spark, sf_dir)
        .select("doc_id", "predicted_lang")
        .join(docs, "doc_id")
        .select(F.col("predicted_lang").alias("pl"), F.col("lang").alias("gl"))
    )
    pc = pred.groupBy(F.col("pl").alias("cls")).agg(
        F.count(F.lit(1)).alias("np")
    )
    gc = pred.groupBy(F.col("gl").alias("cls")).agg(
        F.count(F.lit(1)).alias("ng")
    )
    diag = (
        pred.where(F.col("pl") == F.col("gl"))
        .groupBy(F.col("pl").alias("cls"))
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    j = (
        pc.join(gc, "cls", "full_outer")
        .join(diag, "cls", "left")
        .select(
            "cls",
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            F.coalesce("np", F.lit(0)).cast("long").alias("np"),
            F.coalesce("ng", F.lit(0)).cast("long").alias("ng"),
        )
    )
    return j.select(
        "cls",
        "tp",
        (F.col("np") - F.col("tp")).alias("fp"),
        (F.col("ng") - F.col("tp")).alias("fn"),
        F.when(
            F.col("np") > 0, F.expr("1000000 * tp div np")
        ).alias("precision_ppm"),
        F.when(
            F.col("ng") > 0, F.expr("1000000 * tp div ng")
        ).alias("recall_ppm"),
        F.when(
            F.col("np") + F.col("ng") > 0,
            F.expr("2000000 * tp div (np + ng)"),
        ).alias("f1_ppm"),
    )


_PHRASE = ("row", "scan")


@query(
    "phrase_query_docs",
    sql=f"""
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    hits AS (
        SELECT doc_id, COUNT(*) AS n_hits
        FROM t, UNNEST(range(1, len(ws))) u(i)
        WHERE ws[i] = '{_PHRASE[0]}' AND ws[i + 1] = '{_PHRASE[1]}'
        GROUP BY doc_id
    )
    SELECT doc_id, n_hits FROM hits
    ORDER BY n_hits DESC, doc_id LIMIT 20
    """,
    tags=("llm", "retrieval", "phrase"),
)
def phrase_query_docs(spark, sf_dir):
    """Positional phrase search: top-20 documents by occurrence count
    of the exact adjacent-token phrase — what an inverted index with
    positions answers and a bag-of-words index cannot (the two terms
    co-occurring anywhere is not the phrase).

    Plan: adjacency via the same zipped-shifted-slices gram former as
    bigram_lift (whole-stage codegen; HOF transform lambdas are
    CodegenFallback), scan-local filter BEFORE any shuffle — only
    matching (doc, position) pairs leave the scan — then one keyed
    count and a TakeOrdered top-k (never a global sort).
    """
    docs = read_table(spark, sf_dir, "documents")
    ws = F.split(F.lower(F.col("text")), " ")
    toks = docs.select("doc_id", ws.alias("t"))
    t = F.col("t")
    zipped = F.arrays_zip(
        F.slice(t, 1, F.size(t) - 1), F.slice(t, 2, F.size(t) - 1)
    )
    grams = toks.select(
        "doc_id", F.explode(zipped).alias("g")
    ).where(
        (F.col("g.0") == _PHRASE[0]) & (F.col("g.1") == _PHRASE[1])
    )
    return (
        grams.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .orderBy(F.desc("n_hits"), F.asc("doc_id"))
        .limit(20)
    )
