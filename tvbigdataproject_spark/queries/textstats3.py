"""Round-2 text-analysis additions (north-star surface): Gopher-style
repetition signals and benchmark decontamination.

Both are published LLM-data-pipeline practice: repetition ratios are
the "repetitious text" filters of Rae et al. 2021 (Gopher §A1.1) /
Raffel et al. 2020 (C4); decontamination by n-gram overlap against an
evaluation set is the GPT-3 appendix-C / PaLM approach.

Repetition metrics are pure scan-stage map work (zero shuffles).
Decontamination is one equi-join on the gram — the benchmark side is
tiny by construction and AQE broadcasts it at runtime (no hard hint:
the benchmark could be corpus-sized in adversarial setups).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.text import _bind, shingles, simple_tokens
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "text_repetition_stats",
    sql="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (
        SELECT doc_id, ws,
               CASE WHEN len(ws) >= 2 THEN
                   list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
               ELSE [] END AS g2,
               CASE WHEN len(ws) >= 3 THEN
                   list_transform(range(1, len(ws) - 1),
                                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
               ELSE [] END AS g3
        FROM t)
    SELECT doc_id,
           len(ws) AS n_words,
           len(list_distinct(ws)) * 1.0 / len(ws) AS distinct_word_ratio,
           list_max(list_transform(list_distinct(ws),
                    w -> len(list_filter(ws, x -> x = w)))) * 1.0 / len(ws)
               AS top_word_frac,
           CASE WHEN len(g2) > 0
                THEN (len(g2) - len(list_distinct(g2))) * 1.0 / len(g2)
                ELSE 0.0 END AS dup_2gram_frac,
           CASE WHEN len(g3) > 0
                THEN (len(g3) - len(list_distinct(g3))) * 1.0 / len(g3)
                ELSE 0.0 END AS dup_3gram_frac
    FROM g
    """,
    tags=("text", "quality"),
)
def text_repetition_stats(spark, sf_dir):
    """Gopher-style repetition signals per document: distinct-word
    ratio, most-frequent-word fraction, duplicate 2-gram / 3-gram
    fractions. High values are the standard boilerplate/spam cut.

    All ratios are a single int/int division so the DuckDB comparison
    is bitwise; the token array is let-bound (_bind) so the text is
    tokenized once, not once per referencing subexpression.
    """
    docs = read_table(spark, sf_dir, "documents")

    def grams(ws, n):
        seq = F.sequence(F.lit(1), F.size(ws) - (n - 1))
        g = F.transform(
            seq,
            lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j) for j in range(n)]),
        )
        return F.when(F.size(ws) >= n, g).otherwise(F.array().cast("array<string>"))

    def dup_frac(g):
        total = F.size(g)
        return F.when(
            total > 0,
            (total - F.size(F.array_distinct(g))).cast("double") / total,
        ).otherwise(F.lit(0.0))

    def body(ws):
        n = F.size(ws)
        top_count = F.array_max(
            F.transform(
                F.array_distinct(ws),
                lambda w: F.size(F.filter(ws, lambda x: x == w)),
            )
        )
        return F.struct(
            n.alias("n_words"),
            (F.size(F.array_distinct(ws)).cast("double") / n).alias(
                "distinct_word_ratio"
            ),
            (top_count.cast("double") / n).alias("top_word_frac"),
            dup_frac(grams(ws, 2)).alias("dup_2gram_frac"),
            dup_frac(grams(ws, 3)).alias("dup_3gram_frac"),
        )

    stats = _bind(simple_tokens(F.col("text")), body)
    return docs.select("doc_id", stats.alias("s")).select("doc_id", "s.*")


@query(
    "decontaminate_overlap",
    sql="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                     || ' ' || ws[i+4] AS s
        FROM t, UNNEST(range(1, len(ws) - 3)) AS u(i)
        WHERE len(ws) >= 5
    ),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0),
    corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 <> 0)
    SELECT c.doc_id, COUNT(*) AS n_overlapping_grams
    FROM corpus c JOIN bench b ON c.s = b.s
    GROUP BY c.doc_id
    """,
    tags=("text", "decontamination"),
)
def decontaminate_overlap(spark, sf_dir):
    """Benchmark decontamination: flag corpus documents sharing any
    word-5-gram with the held-out set (here: every 10th doc plays the
    benchmark). Output: (doc_id, n_overlapping_grams) for flagged docs.

    Scale shape: distinct 5-grams per side, one equi-join on the gram
    string, count per doc. The benchmark side is orders of magnitude
    smaller than the corpus, so AQE broadcasts it; the corpus side is
    touched once in the scan stage (shingling is an array expression,
    no explode until the join input).
    """
    docs = read_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(shingles(F.col("text"), n=5, distinct=True)).alias("s")
    )
    bench = sh.where(F.col("doc_id") % 10 == 0).select("s").distinct()
    corpus = sh.where(F.col("doc_id") % 10 != 0)
    return (
        corpus.join(bench, "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlapping_grams"))
    )
