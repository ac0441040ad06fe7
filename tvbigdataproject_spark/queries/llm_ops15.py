"""LLM-ops batch 15: language-model smoothing, ranking agreement,
lexical-diversity normalization, and a privacy release mechanism —
four corpus operators the earlier tiers stop just short of:

- kneser_ney_bigram_topk  interpolated Kneser-Ney bigram probabilities
                          (absolute discount D = 3/4, continuation
                          counts) for the corpus's top bigrams — THE
                          production n-gram smoother (the add-one and
                          Good-Turing tiers are its baselines)
- rbo_term_rankings       rank-biased overlap (p = 3/4, depth 10)
                          between the frequency ranking and the
                          document-frequency ranking of terms — the
                          top-weighted agreement measure for comparing
                          retrieval/scoring variants
- msttr_by_source         mean segmental type-token ratio (50-token
                          non-overlapping windows) per source — the
                          length-normalized lexical diversity screen
                          (raw TTR is incomparable across doc lengths)
- dp_noisy_source_counts  per-source counts released through a
                          deterministic Laplace mechanism (inverse-CDF
                          on an md5-uniform, scale 1/eps) — the DP
                          release SHAPE with a replayable noise draw
                          (documented: reproducible noise is for
                          engine-parity testing, not a privacy claim)

Counts and ranks stay exact integers; probabilities/noise go through
shared expression text and the portable ln kernel, so all four are
full-value oracle-checked.
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

# ---------------------------------------------------------------- Q69

_KN_TOPK = 20
# interpolated KN with absolute discount D = 3/4 (exact binary):
# P(w2|w1) = (c12 - D)/c1 + (D * n1plus_fwd / c1) * (n1plus_bwd / B)
_KN_P = (
    "(CAST(c12 AS DOUBLE) - CAST(3 AS DOUBLE) / CAST(4 AS DOUBLE))"
    " / CAST(c1 AS DOUBLE)"
    " + (CAST(3 AS DOUBLE) / CAST(4 AS DOUBLE)"
    " * CAST(n1plus_fwd AS DOUBLE) / CAST(c1 AS DOUBLE))"
    " * (CAST(n1plus_bwd AS DOUBLE) / CAST(b_types AS DOUBLE))"
)


def _kn_sql() -> str:
    grams = """
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT string_split(lower(text), ' ') AS t FROM documents),
         UNNEST(range(1, len(t))) AS u(i)
    WHERE len(t) >= 2
    """
    return f"""
    WITH g AS ({grams}),
    big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM g GROUP BY 1, 2),
    left_ AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                     CAST(COUNT(*) AS BIGINT) AS n1plus_fwd
              FROM big GROUP BY 1),
    right_ AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1plus_bwd
               FROM big GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS b_types FROM big)
    SELECT b.w1, b.w2, b.c12, l.c1, l.n1plus_fwd, r.n1plus_bwd,
           {_KN_P} AS p_kn
    FROM big b
    JOIN left_ l ON b.w1 = l.w1
    JOIN right_ r ON b.w2 = r.w2
    CROSS JOIN tot
    ORDER BY b.c12 DESC, b.w1, b.w2
    LIMIT {_KN_TOPK}
    """


@query(
    "kneser_ney_bigram_topk",
    sql=_kn_sql(),
    tags=("llm", "lm", "smoothing"),
)
def kneser_ney_bigram_topk(spark, sf_dir):
    """Interpolated Kneser-Ney bigram probabilities for the corpus's
    top-{k} bigrams: absolute discount D = 3/4 off the raw bigram
    count, with the reclaimed mass backed off to the CONTINUATION
    unigram (how many distinct left contexts precede w2 — the "San
    Francisco" insight: 'francisco' is frequent but follows almost
    nothing, so its continuation probability is tiny). The production
    n-gram smoother; the suite's add-one (cross_entropy_lang_matrix)
    and Good-Turing tiers are its baselines.

    Exactness: c12, c1 = SUM of bigram counts by left token, N1+
    forward/backward = distinct-continuation counts, and B = distinct
    bigram types are all exact BIGINTs; D = 3/4 is exact binary and
    p_kn is ONE shared double expression (observed bigrams have
    c12 >= 1 > D, so the discounted term needs no clamp).

    Scale shape: one bigram aggregate (map-side combined), two keyed
    marginal aggregates OVER THE TYPE TABLE (not the token stream),
    a one-row type-count broadcast, and a TakeOrdered top-{k}; joins
    carry only the type tables.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.lower("text"), " ").alias("t")).where(
        F.size("t") >= 2
    )
    grams = toks.select(
        F.posexplode(F.slice("t", 1, F.size("t") - 1)).alias("i", "w1"),
        F.col("t"),
    ).select("w1", F.col("t")[F.col("i") + 1].alias("w2"))
    big = grams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    left = big.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1plus_fwd"),
    )
    right = big.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1plus_bwd")
    )
    tot = big.agg(F.count(F.lit(1)).cast("long").alias("b_types"))
    out = (
        big.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(tot))
        .orderBy(F.col("c12").desc(), "w1", "w2")
        .limit(_KN_TOPK)
    )
    return out.selectExpr(
        "w1", "w2", "c12", "c1", "n1plus_fwd", "n1plus_bwd",
        f"{_KN_P} AS p_kn",
    )


kneser_ney_bigram_topk.__doc__ = kneser_ney_bigram_topk.__doc__.format(
    k=_KN_TOPK
)

# ---------------------------------------------------------------- Q70

_RBO_DEPTH = 10
# p = 3/4: p^i spelled as exact integer powers 3^i / 4^i (both exact
# doubles for i <= 10), so every term is correctly rounded on shared
# inputs. Unextrapolated RBO@d = (1-p)/p * sum_{i<=d} p^i * X_i / i.
_RBO_EXPR = " + ".join(
    f"(CAST({3 ** i} AS DOUBLE) / CAST({4 ** i} AS DOUBLE))"
    f" * CAST(x{i} AS DOUBLE) / CAST({i} AS DOUBLE)"
    for i in range(1, _RBO_DEPTH + 1)
)
_RBO = (
    f"(CAST(1 AS DOUBLE) / CAST(4 AS DOUBLE))"
    f" / (CAST(3 AS DOUBLE) / CAST(4 AS DOUBLE)) * ({_RBO_EXPR})"
)
_RBO_XCOLS_SQL = ", ".join(
    f"CAST(COALESCE(SUM(CASE WHEN m <= {i} THEN 1 ELSE 0 END), 0)"
    f" AS BIGINT) AS x{i}"
    for i in range(1, _RBO_DEPTH + 1)
)


def _rbo_sql() -> str:
    tf = """
    SELECT w, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w
          FROM documents)
    GROUP BY 1
    """
    # only terms inside SOME top-d prefix influence X_i, so the global
    # rankings never materialize: each side is a TakeOrdered top-d and
    # the rank window runs over that d-row list (its row_number IS the
    # global rank — it is the global order's prefix)
    top_a = f"""
    SELECT w, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS ra
    FROM (SELECT w, n FROM ({tf})
          ORDER BY n DESC, w LIMIT {_RBO_DEPTH})
    """
    top_b = f"""
    SELECT w, ROW_NUMBER() OVER (ORDER BY df DESC, w) AS rb
    FROM (SELECT w, df FROM ({tf})
          ORDER BY df DESC, w LIMIT {_RBO_DEPTH})
    """
    return f"""
    SELECT {_RBO_DEPTH} AS depth, x{_RBO_DEPTH} AS overlap_at_depth,
           {_RBO} AS rbo_p75
    FROM (SELECT {_RBO_XCOLS_SQL}
          FROM (SELECT GREATEST(a.ra, b.rb) AS m
                FROM ({top_a}) a JOIN ({top_b}) b ON a.w = b.w))
    """


@query(
    "rbo_term_rankings",
    sql=_rbo_sql(),
    tags=("llm", "ranking", "eval"),
)
def rbo_term_rankings(spark, sf_dir):
    """Rank-biased overlap (p = 3/4, depth {d}) between two term
    rankings of the same corpus — by raw frequency vs by document
    frequency: RBO is the top-weighted agreement measure (depth-i
    overlap X_i weighted by p^i), the right way to compare two scoring
    variants where only the head of the ranking matters (Kendall/
    Spearman weight the tail equally).

    Determinism: both rankings are ROW_NUMBER over (metric DESC, term);
    X_i counts terms whose WORSE rank is <= i (exactly |A_i ∩ B_i|,
    since both rankings cover the same term universe); p^i is spelled
    as the exact integer power 3^i/4^i, so the weighted sum is a
    fixed-order shared expression.

    Scale shape: one token aggregate to the term-type table, then two
    TakeOrdered top-{d} lists whose {d}-row rank windows ARE the global
    ranks (a prefix of the global order) — the vocab-wide ranking never
    materializes (the zipf r9 lesson); the statistic is one
    {x}-column conditional aggregate over the joined prefix lists.
    """
    docs = read_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("doc_id").cast("long").alias("df"),
        )
    )
    from pyspark.sql import Window

    top_a = (
        tf.select("w", "n")
        .orderBy(F.col("n").desc(), "w")
        .limit(_RBO_DEPTH)
        .select(
            "w",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "w"))
            .alias("ra"),
        )
    )
    top_b = (
        tf.select("w", "df")
        .orderBy(F.col("df").desc(), "w")
        .limit(_RBO_DEPTH)
        .select(
            "w",
            F.row_number()
            .over(Window.orderBy(F.col("df").desc(), "w"))
            .alias("rb"),
        )
    )
    ranked = top_a.join(top_b, "w").select(
        F.greatest("ra", "rb").alias("m")
    )
    xagg = ranked.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("m") <= i, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias(f"x{i}")
            for i in range(1, _RBO_DEPTH + 1)
        ]
    )
    return xagg.selectExpr(
        f"{_RBO_DEPTH} AS depth",
        f"x{_RBO_DEPTH} AS overlap_at_depth",
        f"{_RBO} AS rbo_p75",
    )


rbo_term_rankings.__doc__ = rbo_term_rankings.__doc__.format(
    d=_RBO_DEPTH, x=_RBO_DEPTH
)

# ---------------------------------------------------------------- Q71

_MS_W = 50  # tokens per segment


@query(
    "msttr_by_source",
    sql=f"""
    WITH pos AS (
        SELECT doc_id, source, t[i] AS w, i - 1 AS p
        FROM (SELECT doc_id, source,
                     string_split(lower(text), ' ') AS t
              FROM documents),
             UNNEST(range(1, len(t) + 1)) AS u(i)
    ),
    seg AS (
        SELECT source, doc_id, p // {_MS_W} AS win,
               CAST(COUNT(*) AS BIGINT) AS n_toks,
               CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types
        FROM pos GROUP BY 1, 2, 3
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(n_types) AS DOUBLE)
               / (CAST({_MS_W} AS DOUBLE) * CAST(COUNT(*) AS DOUBLE))
               AS msttr
    FROM seg WHERE n_toks = {_MS_W}
    GROUP BY 1 ORDER BY 1
    """,
    tags=("llm", "text", "diversity"),
)
def msttr_by_source(spark, sf_dir):
    """Mean segmental type-token ratio per source: documents are cut
    into NON-OVERLAPPING {w}-token segments (trailing partials
    dropped), each segment's distinct/total ratio is averaged — the
    length-normalized lexical diversity measure (raw TTR falls with
    document length by Heaps' law, so cross-source raw comparisons are
    meaningless; fixed-size segments remove the bias).

    Exactness: per-segment type counts are exact integers; the mean is
    sum(types) / ({w} * n_windows), one shared double division.

    Scale shape: posexplode + a (doc, window) keyed distinct-count —
    corpus-partitioned by doc, no windows over the token stream; the
    per-source rollup is dim-bounded (20 rows).
    """
    docs = read_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.lower("text"), " ")).alias("p", "w"),
    )
    seg = (
        pos.withColumn("win", (F.col("p") / _MS_W).cast("long"))
        .groupBy("source", "doc_id", "win")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.countDistinct("w").cast("long").alias("n_types"),
        )
    )
    return (
        seg.where(F.col("n_toks") == _MS_W)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            (
                F.sum("n_types").cast("double")
                / (
                    F.lit(float(_MS_W))
                    * F.count(F.lit(1)).cast("double")
                )
            ).alias("msttr"),
        )
        .orderBy("source")
    )


msttr_by_source.__doc__ = msttr_by_source.__doc__.format(w=_MS_W)

# ---------------------------------------------------------------- Q72

# deterministic Laplace draw: u in (0,1) from a 52-bit md5 slice,
# X = -(1/eps) * sign(u - 1/2) * ln(1 - 2*|u - 1/2|); eps = 1.
# 1 - 2|u-1/2| >= 2^-53 stays inside plog's ladder domain.
# The hex->int step is engine-specific SPELLING (DuckDB ::BIGINT vs
# Spark conv), identical VALUE — the portable-hash convention from the
# CM-sketch / WL-color family; the arithmetic after it is shared text.
_DP_U_TAIL = (
    " AS DOUBLE) + CAST(0.5 AS DOUBLE))"
    f" / CAST({float(1 << 52)!r} AS DOUBLE)"
)
_DP_U_SQL = (
    "(CAST(('0x' || substr(md5('lap:' || source), 1, 13))::BIGINT"
    + _DP_U_TAIL
)
_DP_U_SPARK = (
    "(CAST(CAST(conv(substring(md5(concat('lap:', source)), 1, 13),"
    " 16, 10) AS BIGINT)" + _DP_U_TAIL
)
_DP_NOISE = (
    "CAST(0 AS DOUBLE) - (CASE WHEN u >= CAST(0.5 AS DOUBLE)"
    " THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE)"
    " - CAST(1 AS DOUBLE) END) * _ln1m"
)


def _dp_sql() -> str:
    base = """
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1
    """
    with_u = f"SELECT *, {_DP_U_SQL} AS u FROM ({base})"
    ln_arg = (
        "CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE)"
        " * abs(u - CAST(0.5 AS DOUBLE))"
    )
    scored = sql_wrap_stages(
        f"({with_u})", plog_stages(ln_arg, "_ln1m", "_dp_")
    )
    return f"""
    SELECT source, n_docs, noise,
           CAST(n_docs AS DOUBLE) + noise AS noisy_count
    FROM (SELECT source, n_docs, {_DP_NOISE} AS noise FROM {scored})
    ORDER BY source
    """


@query(
    "dp_noisy_source_counts",
    sql=_dp_sql(),
    tags=("llm", "privacy", "release"),
)
def dp_noisy_source_counts(spark, sf_dir):
    """Per-source document counts released through the Laplace
    mechanism shape (scale 1/eps, eps = 1): noise is drawn by
    inverse-CDF — X = -sign(u - 1/2) * ln(1 - 2|u - 1/2|) — from a
    DETERMINISTIC md5-uniform u per source. The deterministic draw is
    what makes the release engine-reproducible and oracle-checkable
    (and regression-testable); a real privacy deployment would swap
    the hash-uniform for a fresh secure draw and this query documents
    exactly where (the u column). Companion to the k-anonymity /
    l-diversity / t-closeness audit tier: those measure leakage, this
    is the standard mitigation's computational shape.

    Exactness: u is a 52-bit md5 slice (+1/2, /2^52 — exact ops), so
    1 - 2|u - 1/2| >= 2^-53 stays inside the portable ln ladder; the
    noise expression is shared text through the plog kernel.

    Scale shape: one dim-bounded aggregate (20 rows) + scalar
    expressions; the mechanism costs nothing at any SF.
    """
    docs = read_table(spark, sf_dir, "documents")
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    with_u = base.selectExpr("*", f"{_DP_U_SPARK} AS u")
    ln_arg = (
        "CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE)"
        " * abs(u - CAST(0.5 AS DOUBLE))"
    )
    scored = apply_stages(with_u, plog_stages(ln_arg, "_ln1m", "_dp_"))
    return (
        scored.selectExpr(
            "source", "n_docs", f"{_DP_NOISE} AS noise"
        )
        .selectExpr(
            "source",
            "n_docs",
            "noise",
            "CAST(n_docs AS DOUBLE) + noise AS noisy_count",
        )
        .orderBy("source")
    )
