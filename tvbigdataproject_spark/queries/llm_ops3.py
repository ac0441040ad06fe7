"""Third LLM-pipeline batch: containment near-dup, corpus heavy
hitters, and per-segment decile profiling.

All value-checked. Containment complements the Jaccard/MinHash/SimHash
family (operators/dedup.py) with the asymmetric subset/superset score;
heavy hitters and deciles are the two profiling passes run over every
fresh crawl before filtering thresholds are chosen.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.operators.dedup import ngram_containment_pairs
from tvbigdataproject_spark.queries.dedup import _SH_SQL
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_TOPN_TERMS = 20


@query(
    "dedup_containment",
    sql=f"""
    WITH {_SH_SQL},
    shdict AS (
        SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS sid
        FROM (SELECT DISTINCT s FROM sh)
    ),
    she AS (
        SELECT sh.doc_id, shdict.sid FROM sh JOIN shdict ON shdict.s = sh.s
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM she GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        FROM she a JOIN she b ON a.sid = b.sid AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, i * 1.0 / LEAST(sa.n, sb.n) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE i * 1.0 / LEAST(sa.n, sb.n) >= 0.6
    """,
    tags=("dedup", "similarity", "containment"),
)
def dedup_containment(spark, sf_dir):
    """Asymmetric near-dup pairs by shingle containment ≥ 0.6 —
    catches a short document embedded inside a longer one, which
    Jaccard's union denominator dilutes below any workable threshold.
    Same single-self-join count-based plan as dedup_ngram_jaccard
    (operators/dedup.py:ngram_containment_pairs)."""
    return ngram_containment_pairs(
        read_table(spark, sf_dir, "documents"), n=3, threshold=0.6
    )


@query(
    "heavy_hitter_terms",
    sql=f"""
    SELECT term, COUNT(*) AS n
    FROM (
        SELECT UNNEST(string_split(lower(text), ' ')) AS term FROM documents
    )
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT {_TOPN_TERMS}
    """,
    tags=("llm", "profile", "topk"),
)
def heavy_hitter_terms(spark, sf_dir):
    """Global top-{20} most frequent terms with exact counts — the
    stopword/boilerplate profile read before choosing quality-filter
    thresholds. Ties broken by term so the cut is deterministic.

    Scale shape: map-side partial counts absorb the token fan-out, the
    shuffle carries one row per distinct term, and the top-k runs as
    TakeOrderedAndProject (per-partition heaps + a k-row driver merge) —
    never a global sort materialization, never a single-partition
    window.
    """
    toks = read_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    )
    return (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(_TOPN_TERMS)
    )


@query(
    "ntile_deciles_acctbal",
    sql="""
    WITH d AS (
        SELECT c_mktsegment,
               NTILE(10) OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal, c_custkey
               ) AS decile,
               c_acctbal
        FROM customer
    )
    SELECT c_mktsegment, decile, COUNT(*) AS n,
           MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
    FROM d GROUP BY c_mktsegment, decile
    """,
    tags=("window", "profile", "ntile"),
)
def ntile_deciles_acctbal(spark, sf_dir):
    """Account-balance decile boundaries per market segment (ntile(10)
    with a c_custkey tie-break so bucket assignment is total-ordered and
    reproducible) — the distribution profile that drives stratified
    policies downstream.

    The window partitions by segment, so parallelism is bounded by the
    segment count — fine for profiling a bounded category column; for a
    high-cardinality or single global decile at 100 TB, approx_percentile
    cut points + a range join replace the ntile (no single-partition
    sort). That variant is approx_quantiles_value's territory; this
    query covers the exact windowed form.
    """
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    d = read_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.ntile(10).over(w).alias("decile"),
        "c_acctbal",
    )
    return d.groupBy("c_mktsegment", "decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("c_acctbal").alias("lo"),
        F.max("c_acctbal").alias("hi"),
    )


_DECILE_PROBS = [i / 10.0 for i in range(1, 10)]


@query(
    "decile_assign_range_join",
    sql="""
    WITH cuts AS (
        SELECT quantile_cont(c_acctbal, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cs
        FROM customer
    ),
    bands AS (
        SELECT i AS decile,
               CASE WHEN i = 1  THEN -1e308 ELSE cs[i - 1] END AS lo,
               CASE WHEN i = 10 THEN  1e308 ELSE cs[i]     END AS hi
        FROM cuts, UNNEST(range(1, 11)) AS t(i)
    )
    SELECT decile, COUNT(*) AS n, MIN(c_acctbal) AS lo_val, MAX(c_acctbal) AS hi_val
    FROM customer JOIN bands ON c_acctbal > lo AND c_acctbal <= hi
    GROUP BY decile
    """,
    tags=("window", "percentile", "range-join"),
)
def decile_assign_range_join(spark, sf_dir):
    """GLOBAL decile assignment without a global sort — the scale path
    promised in ntile_deciles_acctbal's docstring: nine exact percentile
    cut points (one aggregate), a 10-row bands table derived from them,
    and a broadcast range join assigning each row its decile (ties at a
    cut boundary go to the lower band via the half-open (lo, hi]
    intervals; +-1e308 sentinels close the ends). No single-partition
    window anywhere: the only per-row work is a 10-row broadcast probe.
    At 100 TB swap the exact percentile for percentile_approx and
    nothing else changes — the cut points are the only sort-dependent
    piece. The bands side is bounded (10 rows) at any SF, so the
    broadcast nested loop this plans into is the intended shape, same
    as range_join_bands.

    Known oracle-parity assumption: Spark ``percentile()`` and DuckDB
    ``quantile_cont`` must produce bitwise-identical linearly
    interpolated cut points — a last-ulp difference would flip a row
    sitting exactly on a cut into the neighboring decile. It holds here
    because c_acctbal is 2-decimal data whose interpolation arithmetic
    (both engines: lo + frac * (hi - lo) in float64) is exact at this
    precision; do NOT round the cuts "for safety" (Spark
    BigDecimal-rounds, DuckDB multiply-rints — they disagree at
    boundaries, see queries/_stable.py).
    """
    c = read_table(spark, sf_dir, "customer")
    cuts = c.agg(F.percentile("c_acctbal", _DECILE_PROBS).alias("cs"))
    d = F.col("decile")
    bands = cuts.select(
        F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile"), "cs"
    ).select(
        "decile",
        F.when(d == 1, F.lit(-1e308))
        .otherwise(F.element_at("cs", (d - 1).cast("int")))
        .alias("lo"),
        F.when(d == 10, F.lit(1e308))
        .otherwise(F.element_at("cs", d.cast("int")))
        .alias("hi"),
    )
    return (
        c.join(
            F.broadcast(bands),
            (F.col("c_acctbal") > F.col("lo")) & (F.col("c_acctbal") <= F.col("hi")),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").alias("lo_val"),
            F.max("c_acctbal").alias("hi_val"),
        )
    )


@query(
    "rare_term_score",
    sql="""
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term FROM documents
    ),
    freq AS (SELECT term, COUNT(*) AS f FROM toks GROUP BY term),
    tot AS (SELECT COUNT(*) AS total FROM toks)
    SELECT doc_id,
           COUNT(*) AS n_tok,
           SUM(f) AS sum_freq,
           SUM(f) * 1.0 / (COUNT(*) * (SELECT total FROM tot)) AS mean_prob
    FROM toks JOIN freq USING (term)
    GROUP BY doc_id
    """,
    tags=("llm", "quality", "unigram"),
)
def rare_term_score(spark, sf_dir):
    """Mean unigram probability per document — the linear-space cousin
    of the unigram log-likelihood quality proxy (documents full of rare
    terms score low, boilerplate scores high). Linear instead of log for
    the same reason as tfidf_top_terms: transcendentals are not
    bit-reproducible across engines, and the RANKING under any monotone
    transform is unchanged. Better still, the score is a ratio of exact
    BIGINT sums (token-frequency sum over n_tok x corpus total), so the
    single double division is bit-identical by construction — no
    stable-sum scaffolding needed.

    Scale shape: one token-frequency aggregate, one corpus-sized
    equi-join on term (map-side partials absorb the fan-out on hot
    terms), one per-doc aggregate. The one-row corpus total is attached
    by Catalyst as a scalar subquery on the oracle side and a broadcast
    in Spark — constant either way.
    """
    toks = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    per_doc = (
        toks.hint("SHUFFLE_HASH")
        .join(freq.hint("SHUFFLE_HASH"), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("f").alias("sum_freq"),
        )
    )
    total = toks.agg(F.count(F.lit(1)).cast("long").alias("total"))
    return per_doc.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_tok",
        "sum_freq",
        (
            F.col("sum_freq")
            / (F.col("n_tok") * F.col("total")).cast("double")
        ).alias("mean_prob"),
    )


# GPT-2-style pretokenization, reduced to disjoint character classes:
# letter runs, digit runs, single non-alphanumeric marks. Disjointness
# makes greedy alternation behave identically in Java regex (Spark) and
# RE2 (DuckDB) — leftmost-first vs leftmost-longest cannot differ when
# no alternative's match can extend another's.
_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@query(
    "text_regex_tokens",
    sql=f"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '{_TOKEN_RE}') AS ts
        FROM documents
    )
    SELECT doc_id,
           len(ts) AS n_tok,
           len(list_distinct(ts)) AS n_distinct,
           len(ts) - len(list_distinct(ts)) AS n_repeated
    FROM toks
    """,
    tags=("llm", "tokenize"),
)
def text_regex_tokens(spark, sf_dir):
    """BPE-style pretokenizer counts per document (SURVEY north star:
    token counting beyond whitespace): letter runs, digit runs, and
    single punctuation marks — the class structure GPT-2's
    pretokenization regex induces, reduced to a dialect-safe core (see
    _TOKEN_RE). Token and distinct-token counts are the inputs to
    context-window budgeting and repetition screens; all scan-stage
    array expressions, zero shuffles.
    """
    ts = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOKEN_RE), F.lit(0))
    return read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(ts).alias("n_tok"),
        F.size(F.array_distinct(ts)).alias("n_distinct"),
        (F.size(ts) - F.size(F.array_distinct(ts))).alias("n_repeated"),
    )
