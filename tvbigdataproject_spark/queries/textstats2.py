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


_STRATA = {"en": 0.2, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 1.0}


def _check_stratified(spark, sf_dir, rows, cols):
    """Bounded-value check (no SQL twin exists — the Bernoulli draw is
    Spark's hash): (1) every sampled row is a genuine source row, no
    duplicates, no unknown strata; (2) the fraction-1.0 stratum keeps
    EXACTLY its population (a hard value check); (3) every other
    stratum's count sits within 5 sigma of its binomial expectation;
    (4) a second independent evaluation of the plan returns the
    identical row set (seeded determinism under a pinned layout)."""
    import math

    idx = {c: i for i, c in enumerate(cols)}
    got = {(r[idx["doc_id"]], r[idx["lang"]], r[idx["source"]]) for r in rows}
    if len(got) != len(rows):
        return f"{len(rows) - len(got)} duplicate sampled rows"
    src = {
        (r.doc_id, r.lang, r.source)
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source")
        .collect()
    }
    if not got <= src:
        return f"{len(got - src)} sampled rows not present in the source table"
    totals: dict[str, int] = {}
    for _, lang, _ in src:
        totals[lang] = totals.get(lang, 0) + 1
    counts: dict[str, int] = {}
    for _, lang, _ in got:
        counts[lang] = counts.get(lang, 0) + 1
    if set(counts) - set(_STRATA):
        return f"rows from unsampled strata: {sorted(set(counts) - set(_STRATA))}"
    for lang, frac in _STRATA.items():
        n, k = totals.get(lang, 0), counts.get(lang, 0)
        if frac == 1.0:
            if k != n:
                return f"stratum {lang} frac=1.0 kept {k} of {n} rows"
            continue
        sigma = math.sqrt(n * frac * (1.0 - frac))
        if abs(k - n * frac) > 5.0 * sigma + 1.0:
            return (
                f"stratum {lang}: {k} sampled of {n} at frac={frac} is outside "
                f"the 5-sigma binomial bound"
            )
    again = {
        (r.doc_id, r.lang, r.source)
        for r in stratified_sample(spark, sf_dir).collect()
    }
    if again != got:
        return "second evaluation of the seeded plan returned a different sample"
    return None


@query("stratified_sample", sql=None, tags=("sampling",), check=_check_stratified)
def stratified_sample(spark, sf_dir):
    """Seeded stratified sampling (sampleBy): per-language fractions for
    corpus rebalancing — upsample rare strata, downsample dominant ones.
    Bernoulli per-row sampling: one pass, no shuffle, deterministic for
    a fixed seed *within Spark* (the hash differs across engines, hence
    no SQL oracle — the driver records the rows-only check)."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.sampleBy("lang", fractions=_STRATA, seed=42).select(
        "doc_id", "lang", "source"
    )
