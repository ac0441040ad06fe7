"""Round-3 training-data additions: corpus n-gram statistics, a
composable quality gate that reports *why* a document failed, a
deterministic per-domain document cap, and mergeable HLL distinct
sketches (the re-aggregatable cardinality story a 100 TB pipeline needs
— count once per shard, union the sketches, never rescan).

All but the sketch query are oracle-checked bitwise; HLL estimates are
engine-specific by construction (Apache DataSketches in Spark, none in
DuckDB), so that query carries exact counts alongside the estimates and
tests/test_sketches.py bounds the relative error instead.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "ngram_bigram_counts",
    sql="""
    WITH toks AS (
        SELECT string_split(lower(text), ' ') AS t FROM documents
    ),
    grams AS (
        SELECT UNNEST(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))
               AS bigram
        FROM toks WHERE len(t) >= 2
    )
    SELECT bigram, COUNT(*) AS n
    FROM grams GROUP BY bigram HAVING COUNT(*) >= 20
    """,
    tags=("llm", "ngram"),
)
def ngram_bigram_counts(spark, sf_dir):
    """Corpus-wide bigram frequencies (the building block of n-gram LM
    stats, boilerplate phrase mining, and tokenizer corpus analysis),
    thresholded at >= 20 occurrences — a deterministic filter, not a
    LIMIT, so the result is well-defined at every scale.

    Scale shape: bigram formation is scan-local (zip of shifted
    slices over the token array); the only exchange is the count
    aggregate with map-side partials, and the HAVING prunes the long
    tail before any downstream join.
    """
    # token array materialized first (the _bind re-tokenization trap),
    # bigrams formed by zipping two shifted slices — no transform()
    # lambda, so the whole gram stage stays in whole-stage codegen
    # instead of interpreted HOF eval; the string concat happens as a
    # scalar expression AFTER the explode. A 1-token document slices
    # to empty arrays and zips to nothing (no length guard needed).
    t = F.col("t")
    zipped = F.arrays_zip(
        F.slice(t, 1, F.size(t) - 1), F.slice(t, 2, F.size(t) - 1)
    )
    return (
        read_table(spark, sf_dir, "documents")
        .select(F.split(F.lower(F.col("text")), " ").alias("t"))
        .select(F.explode(zipped).alias("g"))
        .select(F.concat_ws(" ", F.col("g.0"), F.col("g.1")).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 20)
    )


@query(
    "quality_gate_reasons",
    sql="""
    WITH feats AS (
        SELECT doc_id, n_chars,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                   / length(text) AS alpha_ratio,
               len(list_distinct(string_split(lower(text), ' '))) * 1.0
                   / len(string_split(lower(text), ' ')) AS distinct_ratio,
               list_aggregate(list_transform(string_split(lower(text), ' '),
                                             x -> length(x)), 'sum') * 1.0
                   / len(string_split(lower(text), ' ')) AS mean_word_len
        FROM documents
    ),
    gated AS (
        SELECT doc_id,
               list_filter([
                   CASE WHEN n_chars < 200 THEN 'short' END,
                   CASE WHEN alpha_ratio < 0.815 THEN 'low_alpha' END,
                   CASE WHEN distinct_ratio < 0.30 THEN 'repetitive' END,
                   CASE WHEN mean_word_len > 4.8 THEN 'long_words' END
               ], x -> x IS NOT NULL) AS reasons
        FROM feats
    )
    SELECT doc_id, reasons, len(reasons) = 0 AS passed FROM gated
    """,
    tags=("llm", "quality"),
)
def quality_gate_reasons(spark, sf_dir):
    """Composable quality gate with attribution: each document gets the
    array of filters it failed (short / low alpha ratio / repetitive
    vocabulary / implausible word length) plus the pass verdict. Real
    pipelines keep the reasons — filter-rate dashboards and ablations
    need to know *why* documents dropped, not just how many.

    All four signals are ratios of integer counts, so the doubles
    compare identically in both engines. Pure scan-stage map work: zero
    shuffles at any corpus size.
    """
    toks = F.split(F.lower(F.col("text")), " ")
    alpha_ratio = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")) / F.length(
        "text"
    )
    distinct_ratio = F.size(F.array_distinct(toks)) / F.size(toks)
    mean_word_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    ) / F.size(toks)
    reasons = F.array_compact(
        F.array(
            F.when(F.col("n_chars") < 200, "short"),
            F.when(alpha_ratio < 0.815, "low_alpha"),
            F.when(distinct_ratio < 0.30, "repetitive"),
            F.when(mean_word_len > 4.8, "long_words"),
        )
    )
    return read_table(spark, sf_dir, "documents").select(
        "doc_id",
        reasons.alias("reasons"),
        (F.size(reasons) == 0).alias("passed"),
    )


@query(
    "per_domain_cap",
    sql="""
    WITH ranked AS (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (
                   PARTITION BY lang, source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, lang, source, rn FROM ranked WHERE rn <= 5
    """,
    tags=("llm", "mixture", "sampling"),
)
def per_domain_cap(spark, sf_dir):
    """Deterministic per-domain document cap: keep at most 5 documents
    per (lang, source), chosen by hash order rather than id order so the
    kept subset is position-unbiased yet fully reproducible — the
    standard way to stop one crawl domain from dominating a mixture.

    Scale shape: one window shuffle on the domain key. The md5 rank key
    is the portable-hash family (functions/hashing.py) so DuckDB replays
    the exact same choice; at 100 TB a skewed domain makes this window a
    straggler, and the production lever is the same two-phase trick as
    salted_type_counts — per-salt-partition row_number, keep rn <= cap
    within salt, then a bounded second pass — documented here, not
    needed at bench scales.
    """
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 5)
    )


@query(
    "sketch_distinct_users",
    sql=None,  # HLL estimates are engine-specific; bounded-error test instead
    tags=("llm", "sketch", "approx"),
)
def sketch_distinct_users(spark, sf_dir):
    """Mergeable distinct-count sketches (Apache DataSketches HLL, built
    into Spark 3.5+): per-event-type user cardinality sketches, unioned
    into an all-types row WITHOUT rescanning the data — `hll_union_agg`
    over the per-group sketches. This is the 100 TB cardinality pattern:
    sketch once per shard/partition/day, merge sketches forever after;
    exact distinct cannot re-aggregate (distinct-of-sums != sum-of-
    distincts) and recounts the world on every roll-up.

    Exact counts ride alongside so the driver's rows-only check plus
    tests/test_sketches.py (relative error <= 5%, merged estimate
    consistent with the sketch-of-all) pin the behavior.
    """
    ev = read_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    merged = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.col("sk"),
        F.lit(None).cast("long").alias("exact_users"),
    )
    return (
        per_type.unionByName(merged)
        .select(
            "event_type",
            F.hll_sketch_estimate("sk").alias("approx_users"),
            "exact_users",
        )
    )
