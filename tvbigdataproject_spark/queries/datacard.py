"""Dataset-card statistics: the one-pass corpus summary a training-data
release ships with (docs / tokens / chars / unique-text counts at every
lang x source rollup level) — the reporting twin of the prep tiers
(dedup, quality, mixture). HuggingFace-style dataset cards and C4/Pile
release notes all carry exactly this table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "corpus_card_rollup",
    sql="""
    WITH f AS (
        SELECT lang, source,
               len(string_split(lower(text), ' ')) AS toks,
               n_chars,
               md5(text) AS h
        FROM documents
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT h) AS n_unique_texts
    FROM f GROUP BY ROLLUP (lang, source)
    """,
    tags=("llm", "reporting", "agg"),
)
def corpus_card_rollup(spark, sf_dir):
    """Corpus summary at (lang, source), (lang), and grand-total grain:
    document count, whitespace-token count, char volume, and the
    exact-distinct text count (via portable md5 — the dedup tier's
    digest), whose gap to n_docs is the exact-duplicate rate per slice.

    Scale shape: one scan; the per-row features (token count, digest)
    are scan-local scalar expressions, the ROLLUP is a single
    partial-aggregated exchange, and the only per-group state beyond
    counters is the distinct-digest set — at 100 TB swap the exact
    COUNT(DISTINCT h) for approx_count_distinct per slice (the HLL
    sketch tier) if the card tolerates ±2%; the exact form is kept
    here because the oracle pins it bitwise.
    """
    docs = read_table(spark, sf_dir, "documents")
    f = docs.select(
        "lang",
        "source",
        F.size(F.split(F.lower(F.col("text")), " ")).alias("toks"),
        "n_chars",
        F.md5(F.col("text")).alias("h"),
    )
    return f.rollup("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("h").alias("n_unique_texts"),
    )
