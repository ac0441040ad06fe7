"""Additional text operators: pattern-based content flags (the
PII/boilerplate-counter shape) and seeded stratified sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "text_pattern_flags",
    sql="""
    WITH t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws FROM documents)
    SELECT doc_id,
           len(list_filter(ws, w -> w = 'spark'))      AS n_spark,
           len(list_filter(ws, w -> w LIKE '%er'))     AS n_er_suffix,
           length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit_chars,
           CASE WHEN len(list_filter(ws, w -> w LIKE 'http%')) > 0 THEN 1 ELSE 0 END
               AS has_url
    FROM t
    """,
    tags=("text", "patterns"),
)
def text_pattern_flags(spark, sf_dir):
    """Pattern-count flags per document — the shape of PII / boilerplate
    / contamination counters in a training-data pipeline (here with
    neutral patterns: a keyword, a suffix class, digit mass, URL-ish
    tokens). Token predicates use string operations rather than regex
    classes where possible so the same spec runs identically under
    Java regex and RE2-based engines."""
    docs = read_table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    return docs.select(
        "doc_id",
        F.size(F.filter(ws, lambda w: w == "spark")).alias("n_spark"),
        F.size(F.filter(ws, lambda w: w.endswith("er"))).alias("n_er_suffix"),
        (
            F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
        ).alias("n_digit_chars"),
        F.when(
            F.size(F.filter(ws, lambda w: w.startswith("http"))) > 0, 1
        ).otherwise(0).alias("has_url"),
    )


@query("stratified_sample", sql=None, tags=("sampling",))
def stratified_sample(spark, sf_dir):
    """Seeded stratified sampling (sampleBy): per-language fractions for
    corpus rebalancing — upsample rare strata, downsample dominant ones.
    Bernoulli per-row sampling: one pass, no shuffle, deterministic for
    a fixed seed *within Spark* (the hash differs across engines, hence
    no SQL oracle — the driver records the rows-only check)."""
    docs = read_table(spark, sf_dir, "documents")
    fractions = {"en": 0.2, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 1.0}
    return docs.sampleBy("lang", fractions=fractions, seed=42).select(
        "doc_id", "lang", "source"
    )
