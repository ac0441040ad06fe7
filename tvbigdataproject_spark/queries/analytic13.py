"""Analytics batch 13: multiple-testing control, vocabulary mass
estimation, corpus diversity, Markov steady state, and OOV drift —
five ops a training-data pipeline asks right after the per-test /
per-source metrics the earlier tiers compute:

- fdr_bh_qvalues            Benjamini-Hochberg step-up over the
                            per-nation mean-balance z-test family —
                            the multiple-comparisons control every
                            per-segment alarm sheet needs before
                            anyone acts on "significant" rows
- good_turing_token_mass    frequency-of-frequencies Good-Turing
                            estimate: unseen-token probability mass
                            and smoothed r* for rare counts — the
                            vocabulary-coverage question ("how much
                            of the language have we NOT crawled")
- ngram_diversity_by_source distinct/total n-gram ratio (n = 1,2,3)
                            per source — the self-repetition screen
                            (low ratio = templated/boilerplate feed)
- markov_stationary_types   stationary distribution of the event-type
                            transition chain by 3 unrolled power-
                            iteration steps in exact scaled-integer
                            arithmetic — where the user population
                            settles, the steady-state twin of
                            transition_entropy_events
- oov_rate_by_source        share of each source's tokens outside the
                            global top-V vocabulary — the
                            tokenizer-drift / domain-shift screen
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.portable import (
    apply_stages,
    pnorm_stages,
    sql_wrap_stages,
)
from tvbigdataproject_spark.queries._stable import (
    dec_to_double_wide,
    sql_huge_to_double_wide,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# ---------------------------------------------------------------- Q44

# known-variance z-test of each nation's mean customer balance vs the
# global mean: z = (mean_i - mean_g) / sqrt(var_g / n_i). Shared
# expression text (Spark selectExpr == oracle SQL) pins bit-equality.
_FDR_Z = (
    "(CAST(s_i AS DOUBLE) / CAST(n_i AS DOUBLE)"
    " - CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE))"
    " / sqrt((sq_g_d / CAST(n_g AS DOUBLE)"
    " - (CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE))"
    " * (CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE)))"
    " / CAST(n_i AS DOUBLE))"
)
# BH step-up on the p-ascending ranking: q_i = min_{j >= i} p_j m / j,
# capped at 1. The running min over the tail makes q monotone, which
# is the step-up rule's actual output (not the raw p*m/rank).
_FDR_QRAW = (
    "p_raw * CAST(m AS DOUBLE) / CAST(rk AS DOUBLE)"
)
_FDR_Q = (
    "LEAST(CAST(1 AS DOUBLE), MIN(q_raw) OVER ("
    "ORDER BY rk ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))"
)


def _fdr_sql() -> str:
    base = """
    SELECT n.n_name AS nation,
           COUNT(*) AS n_i,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS s_i
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """
    glob = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_g,
           CAST(SUM(cents) AS BIGINT) AS s_g,
           SUM(CAST(cents AS HUGEINT) * cents) AS sq_g
    FROM (SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
          FROM customer)
    """
    joined = f"""
    SELECT b.*, g.n_g, g.s_g,
           {sql_huge_to_double_wide('g.sq_g')} AS sq_g_d
    FROM ({base}) b CROSS JOIN ({glob}) g
    """
    scored = sql_wrap_stages(
        f"(SELECT *, {_FDR_Z} AS z FROM ({joined}))",
        pnorm_stages("CAST(0 AS DOUBLE) - abs(z)", "_phi", "_fd_"),
    )
    ranked = f"""
    SELECT nation, n_i, z, p_raw,
           ROW_NUMBER() OVER (ORDER BY p_raw, nation) AS rk,
           COUNT(*) OVER () AS m
    FROM (SELECT nation, n_i, z,
                 CAST(2 AS DOUBLE) * _phi AS p_raw
          FROM {scored})
    """
    return f"""
    SELECT nation, n_i AS n_customers, z, p_raw, rk AS p_rank,
           {_FDR_Q} AS q_bh
    FROM (SELECT *, {_FDR_QRAW} AS q_raw FROM ({ranked}))
    """


@query(
    "fdr_bh_qvalues",
    sql=_fdr_sql(),
    tags=("analytics", "stats", "inference"),
)
def fdr_bh_qvalues(spark, sf_dir):
    """Benjamini-Hochberg q-values for the 25-test family "does this
    nation's mean customer balance differ from the global mean"
    (known-variance z-tests, two-sided p via the portable normal CDF) —
    the multiple-comparisons control: at 25 tests, two or three raw
    p < 0.05 rows are EXPECTED under the null, and the BH step-up
    (q_i = min over j >= i of p_(j) m / j) is what turns the sheet
    into a usable discovery list at a chosen FDR.

    Exactness: means/variance from exact integer cent sums (the
    squared sum lifted to 128-bit through the agreed split-cast); z, p
    and q are identically-spelled IEEE expressions; ranking ties break
    on (p, nation) so the step-up is total-ordered.

    Scale shape: one customer scan -> 25-row test table; the ranking
    and tail-min windows run unpartitioned over that BOUNDED dim-sized
    table (25 rows at any SF), never over fact rows.
    """
    cust = read_table(spark, sf_dir, "customer")
    nat = read_table(spark, sf_dir, "nation")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    base = (
        cust.join(
            F.broadcast(nat),
            cust.c_nationkey == nat.n_nationkey,
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_i"),
            F.sum(cents).cast("long").alias("s_i"),
        )
    )
    glob = cust.select(cents.alias("cents")).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("cents").cast("long").alias("s_g"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "sq_g"
        ),
    )
    glob = glob.select(
        "n_g", "s_g", dec_to_double_wide(F.col("sq_g")).alias("sq_g_d")
    )
    scored = base.crossJoin(F.broadcast(glob)).selectExpr(
        "*", f"{_FDR_Z} AS z"
    )
    scored = apply_stages(
        scored, pnorm_stages("CAST(0 AS DOUBLE) - abs(z)", "_phi", "_fd_")
    )
    ranked = scored.selectExpr(
        "nation", "n_i", "z", "CAST(2 AS DOUBLE) * _phi AS p_raw"
    ).selectExpr(
        "*",
        "ROW_NUMBER() OVER (ORDER BY p_raw, nation) AS rk",
        "COUNT(*) OVER () AS m",
    )
    return ranked.selectExpr("*", f"{_FDR_QRAW} AS q_raw").selectExpr(
        "nation",
        "n_i AS n_customers",
        "z",
        "p_raw",
        "rk AS p_rank",
        f"{_FDR_Q} AS q_bh",
    )


# ---------------------------------------------------------------- Q45

_GT_RMAX = 5


@query(
    "good_turing_token_mass",
    sql=f"""
    WITH tf AS (
        SELECT g, COUNT(*) AS r FROM (
            SELECT t[i] || ' ' || t[i + 1] AS g
            FROM (SELECT string_split(lower(text), ' ') AS t
                  FROM documents),
                 UNNEST(range(1, len(t))) AS u(i)
            WHERE len(t) >= 2
        ) GROUP BY 1
    ),
    nr AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM tf GROUP BY 1),
    tot AS (
        SELECT CAST(SUM(r * n_r) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT)
                   AS n_1
        FROM nr
    )
    SELECT a.r, a.n_r,
           CAST(a.r + 1 AS DOUBLE) * CAST(COALESCE(b.n_r, 0) AS DOUBLE)
               / CAST(a.n_r AS DOUBLE) AS r_star,
           CAST(t.n_1 AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS p_unseen
    FROM nr a
    LEFT JOIN nr b ON b.r = a.r + 1
    CROSS JOIN tot t
    WHERE a.r <= {_GT_RMAX}
    ORDER BY a.r
    """,
    tags=("llm", "infotheory", "vocab"),
)
def good_turing_token_mass(spark, sf_dir):
    """Good-Turing frequency-of-frequencies estimate over the BIGRAM
    stream: for r = 1..{rmax}, the count-of-counts N_r and the smoothed
    expected count r* = (r+1) N_(r+1)/N_r, plus the unseen-mass
    estimate p0 = N_1/N on every row — the "how much of the language
    is still uncrawled" number that sizes the next crawl, and the
    smoothing table an n-gram LM needs for its rare tail. Bigrams, not
    unigrams, because GT lives on the rare tail and a unigram
    vocabulary can saturate (this corpus' unigram min count is 26 —
    an empty GT table; its bigrams have real singleton mass).

    Exactness: every N_r and the gram total are exact BIGINTs; r* and
    p0 are single divisions of exact integers (correctly rounded,
    identical both engines); an absent N_(r+1) bucket yields r* = 0
    (COALESCE, not NULL) so the smoothing table is always total.

    Scale shape: bigram explode -> (gram, r) aggregate (map-side
    combined) -> tiny r-keyed count-of-counts table; the output joins
    N_(r+1) on a table with at most max-frequency rows and the 1-row
    total attaches by broadcast.
    """
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(F.split(F.lower("text"), " ").alias("t"))
    tf = (
        t.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> concat_ws(' ', slice(t, i, 2)))"
                )
            ).alias("g")
        )
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    nr = tf.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    tot = nr.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n_total"),
        F.sum(
            F.when(F.col("r") == 1, F.col("n_r")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_1"),
    )
    nr1 = nr.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next")
    )
    return (
        nr.where(F.col("r") <= _GT_RMAX)
        .join(nr1, "r", "left")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "r",
            "n_r",
            "CAST(r + 1 AS DOUBLE) * CAST(COALESCE(n_r_next, 0) AS DOUBLE)"
            " / CAST(n_r AS DOUBLE) AS r_star",
            "CAST(n_1 AS DOUBLE) / CAST(n_total AS DOUBLE) AS p_unseen",
        )
        .orderBy("r")
    )


good_turing_token_mass.__doc__ = good_turing_token_mass.__doc__.format(
    rmax=_GT_RMAX
)


# ---------------------------------------------------------------- Q46

_ND_ORDERS = (1, 2, 3)


def _nd_leg_sql(k: int) -> str:
    gram = " || ' ' || ".join(f"t[i + {j}]" for j in range(k))
    inst = f"""
    SELECT source, {gram} AS g
    FROM (SELECT source, string_split(lower(text), ' ') AS t
          FROM documents),
         UNNEST(range(1, len(t) - {k} + 2)) AS u(i)
    WHERE len(t) >= {k}
    """
    return f"""
    SELECT source, {k} AS k_order,
           CAST(SUM(c) AS BIGINT) AS n_grams,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
               AS distinct_ratio
    FROM (SELECT source, g, COUNT(*) AS c FROM ({inst}) GROUP BY 1, 2)
    GROUP BY 1
    """


@query(
    "ngram_diversity_by_source",
    sql=" UNION ALL ".join(f"({_nd_leg_sql(k)})" for k in _ND_ORDERS),
    tags=("llm", "profile", "ngram"),
)
def ngram_diversity_by_source(spark, sf_dir):
    """Distinct/total n-gram ratio (type-token ratio) per source for
    n = 1, 2, 3 — the self-repetition screen: a templated or
    boilerplate-heavy feed collapses at order 2-3 (few distinct bigrams
    cover most instances) long before its unigram profile looks odd,
    and the per-source ratio is the number a mixing policy downweights
    on. (ngram_entropy_ladder is the corpus-global entropy twin; this
    is the per-source coverage ratio the sampler actually keys on.)

    Exactness: counts are exact BIGINTs; the ratio is one division.

    Scale shape: per order, one explode -> (source, gram) aggregate
    (map-side combined) -> 20-row source rollup; the three legs union
    bounded tables. The gram fan-out is the corpus token count, same
    as every n-gram query in the suite.
    """
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.split(F.lower("text"), " ").alias("t")
    )
    legs = []
    for k in _ND_ORDERS:
        inst = (
            t.where(F.size("t") >= k)
            .select(
                "source",
                F.explode(
                    F.expr(
                        f"transform(sequence(1, size(t) - {k} + 1),"
                        f" i -> concat_ws(' ', slice(t, i, {k})))"
                    )
                ).alias("g"),
            )
        )
        leg = (
            inst.groupBy("source", "g")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("source")
            .agg(
                F.sum("c").cast("long").alias("n_grams"),
                F.count(F.lit(1)).cast("long").alias("n_types"),
            )
            .selectExpr(
                "source",
                f"{k} AS k_order",
                "n_grams",
                "n_types",
                "CAST(n_types AS DOUBLE) / CAST(n_grams AS DOUBLE)"
                " AS distinct_ratio",
            )
        )
        legs.append(leg)
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


# ---------------------------------------------------------------- Q47

# scaled-integer power iteration: pi carries 1e12-scaled mass,
# transition probabilities carry 1e6-scaled mass, and each step's
# per-edge term is (pi_i * p_ij) div 1e6 — every product <= 1e18
# (exact in int64), every floor-div deterministic, every SUM an exact
# BIGINT: bit-reproducible in any engine, no float accumulation order.
_MK_S_PI = 1_000_000_000_000
_MK_S_P = 1_000_000
_MK_ROUNDS = 3


def _mk_sql() -> str:
    pairs = """
    SELECT cur, nxt FROM (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS nxt
        FROM events
    ) WHERE nxt IS NOT NULL
    """
    trans = f"SELECT cur, nxt, COUNT(*) AS c FROM ({pairs}) GROUP BY 1, 2"
    rowt = f"SELECT cur, CAST(SUM(c) AS BIGINT) AS r FROM ({trans}) GROUP BY 1"
    ps = f"""
    SELECT t.cur, t.nxt,
           (CAST(t.c AS BIGINT) * {_MK_S_P}) // w.r AS ps
    FROM ({trans}) t JOIN ({rowt}) w ON t.cur = w.cur
    """
    cur = f"""
    (SELECT cur AS t,
            CAST({_MK_S_PI} AS BIGINT)
                // (SELECT COUNT(*) FROM ({rowt})) AS pis
     FROM ({rowt}))
    """
    for _ in range(_MK_ROUNDS):
        cur = f"""
        (SELECT s.nxt AS t,
                CAST(SUM((p.pis * s.ps) // {_MK_S_P}) AS BIGINT) AS pis
         FROM {cur} p JOIN ({ps}) s ON p.t = s.cur
         GROUP BY 1)
        """
    return f"""
    SELECT t AS event_type, pis AS pi_scaled,
           CAST(pis AS DOUBLE) / CAST({_MK_S_PI} AS DOUBLE) AS pi
    FROM {cur}
    """


@query(
    "markov_stationary_types",
    sql=_mk_sql(),
    tags=("analytics", "events", "markov"),
)
def markov_stationary_types(spark, sf_dir):
    """Approximate stationary distribution of the event-type Markov
    chain: {r} power-iteration steps of pi' = pi P from the uniform
    start, where P is the MLE transition matrix of consecutive
    (current -> next) event types per user stream — where the user
    population settles if the observed dynamics keep running, the
    steady-state companion of transition_entropy_events (which scores
    the SAME matrix's predictability).

    Exactness: the iteration runs in scaled integers — pi at 1e12,
    row-normalized transition probabilities at 1e6, each step's edge
    term (pi_i * p_ij) div 1e6 an exact int64 product-and-floor (the
    holt_trend_revenue integer-recursion discipline) — so three rounds
    of sums are exact BIGINTs with no float accumulation order.
    Products stay <= 1e18 at ANY corpus size because both factors are
    normalized masses, not counts.

    Scale shape: one windowed pair extraction (the
    transition_entropy_events shuffle), then {r} joins on a
    #types x #types matrix (tiny, broadcast) — the iteration cost is
    independent of corpus size.
    """
    ev = read_table(spark, sf_dir, "events")
    pairs = (
        ev.selectExpr(
            "event_type AS cur",
            "LEAD(event_type) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS nxt",
        )
        .where(F.col("nxt").isNotNull())
    )
    trans = pairs.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    rowt = trans.groupBy("cur").agg(F.sum("c").cast("long").alias("r"))
    ps = trans.join(rowt, "cur").selectExpr(
        "cur", "nxt", f"(CAST(c AS BIGINT) * {_MK_S_P}) div r AS ps"
    )
    k = rowt.agg(F.count(F.lit(1)).alias("k"))
    pi = (
        rowt.select(F.col("cur").alias("t"))
        .crossJoin(F.broadcast(k))
        .selectExpr("t", f"CAST({_MK_S_PI} AS BIGINT) div k AS pis")
    )
    for _ in range(_MK_ROUNDS):
        pi = (
            pi.join(F.broadcast(ps), pi.t == ps.cur)
            .selectExpr(f"nxt AS t2", f"(pis * ps) div {_MK_S_P} AS term")
            .groupBy(F.col("t2").alias("t"))
            .agg(F.sum("term").cast("long").alias("pis"))
        )
    return pi.selectExpr(
        "t AS event_type",
        "pis AS pi_scaled",
        f"CAST(pis AS DOUBLE) / CAST({_MK_S_PI} AS DOUBLE) AS pi",
    )


markov_stationary_types.__doc__ = markov_stationary_types.__doc__.format(
    r=_MK_ROUNDS
)


# ---------------------------------------------------------------- Q48

_OOV_V = 1000


@query(
    "oov_rate_by_source",
    sql=f"""
    WITH toks AS (
        SELECT source, w FROM (
            SELECT source,
                   UNNEST(string_split(lower(text), ' ')) AS w
            FROM documents
        )
    ),
    vocab AS (
        SELECT w FROM (
            SELECT w, COUNT(*) AS n FROM toks GROUP BY 1
        ) ORDER BY n DESC, w LIMIT {_OOV_V}
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.w = v.w
    GROUP BY 1
    """,
    tags=("llm", "profile", "vocab"),
)
def oov_rate_by_source(spark, sf_dir):
    """Share of each source's tokens that fall outside the global
    top-{v} vocabulary — the tokenizer-drift / domain-shift screen: a
    source whose OOV rate spikes against the corpus vocabulary is the
    one whose text the tokenizer will shred into high-fertility
    fragments (token_fertility_by_lang measures the damage; this
    predicts it), and the standard trigger for a vocab refresh or a
    mixing-weight cut.

    Determinism: the vocabulary cut is total-ordered (count desc, then
    token), so the top-{v} set is identical in both engines.

    Scale shape: token counts aggregate map-side; the top-{v} cut runs
    as TakeOrderedAndProject (never a global sort materialization);
    membership attaches back to the token stream by BROADCAST left
    join ({v} rows at any SF), so the only full shuffle is the final
    20-row source rollup's partial aggregation.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "w")
        .limit(_OOV_V)
        .select("w", F.lit(1).alias("_v"))
    )
    return (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .selectExpr(
            "source",
            "n_tokens",
            "n_oov",
            "CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE)"
            " AS oov_rate",
        )
    )


oov_rate_by_source.__doc__ = oov_rate_by_source.__doc__.format(v=_OOV_V)


# ---------------------------------------------------------------- Q52

# truncated Neumann series for the absorbing chain: with Q the
# transition matrix restricted to non-absorbing types, the expected
# number of steps before absorption is sum_{k>=0} (Q^k 1). Truncation
# at K declared (not an approximation of the infinite sum: the output
# IS "expected steps within the first K", the bounded-horizon number
# an SLA dashboard wants). Same scaled-integer discipline as
# markov_stationary_types: v at 1e12, Q at 1e6, per-edge terms
# (ps_ij * v_j) div 1e6 — exact BIGINTs, no float accumulation.
_AB_TARGET = "purchase"
_AB_K = 6


def _ab_sql() -> str:
    pairs = """
    SELECT cur, nxt FROM (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS nxt
        FROM events
    ) WHERE nxt IS NOT NULL
    """
    trans = f"SELECT cur, nxt, COUNT(*) AS c FROM ({pairs}) GROUP BY 1, 2"
    rowt = (
        f"SELECT cur, CAST(SUM(c) AS BIGINT) AS r FROM ({trans})"
        f" WHERE cur <> '{_AB_TARGET}' GROUP BY 1"
    )
    qs = f"""
    SELECT t.cur, t.nxt,
           (CAST(t.c AS BIGINT) * {_MK_S_P}) // w.r AS ps
    FROM ({trans}) t JOIN ({rowt}) w ON t.cur = w.cur
    WHERE t.nxt <> '{_AB_TARGET}'
    """
    cur = f"(SELECT cur AS t, CAST({_MK_S_PI} AS BIGINT) AS v FROM ({rowt}))"
    acc = f"SELECT t, v FROM {cur}"
    for _ in range(_AB_K - 1):
        cur = f"""
        (SELECT s.cur AS t,
                CAST(SUM((p.v * s.ps) // {_MK_S_P}) AS BIGINT) AS v
         FROM ({qs}) s JOIN {cur} p ON s.nxt = p.t
         GROUP BY 1)
        """
        acc += f" UNION ALL SELECT t, v FROM {cur}"
    return f"""
    SELECT t AS event_type,
           CAST(SUM(v) AS BIGINT) AS steps_scaled,
           CAST(SUM(v) AS DOUBLE) / CAST({_MK_S_PI} AS DOUBLE)
               AS expected_steps
    FROM ({acc})
    GROUP BY 1
    """


@query(
    "markov_absorption_steps",
    sql=_ab_sql(),
    tags=("analytics", "events", "markov"),
)
def markov_absorption_steps(spark, sf_dir):
    """Expected number of steps a user spends in non-'{a}' event types
    within a {k}-step horizon before hitting '{a}', per starting type —
    the truncated Neumann series sum over k < {k} of (Q^k 1) on the
    absorbing Markov chain (Q = the transition matrix restricted to
    non-'{a}' types). The funnel-latency companion of
    markov_stationary_types: the stationary query says where users
    settle; this says how long the detour to conversion is from each
    entry point.

    Exactness: scaled-integer iteration (v at 1e12, row-normalized Q
    at 1e6, per-edge product-and-floor-div) — every round's sums are
    exact BIGINTs with no float accumulation order, bit-replayed by
    the oracle. The {k}-step truncation is the declared estimator.

    Scale shape: one windowed pair extraction, then {k} broadcast
    joins on the #types x #types matrix — iteration cost independent
    of corpus size.
    """
    ev = read_table(spark, sf_dir, "events")
    pairs = (
        ev.selectExpr(
            "event_type AS cur",
            "LEAD(event_type) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS nxt",
        )
        .where(F.col("nxt").isNotNull())
    )
    trans = pairs.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    rowt = (
        trans.where(F.col("cur") != _AB_TARGET)
        .groupBy("cur")
        .agg(F.sum("c").cast("long").alias("r"))
    )
    qs = (
        trans.where(F.col("nxt") != _AB_TARGET)
        .join(rowt, "cur")
        .selectExpr(
            "cur", "nxt", f"(CAST(c AS BIGINT) * {_MK_S_P}) div r AS ps"
        )
    )
    v = rowt.selectExpr(
        "cur AS t", f"CAST({_MK_S_PI} AS BIGINT) AS v"
    )
    acc = v
    for _ in range(_AB_K - 1):
        v = (
            F.broadcast(qs)
            .join(v.select(F.col("t").alias("nxt"), "v"), "nxt")
            .selectExpr("cur AS t2", f"(v * ps) div {_MK_S_P} AS term")
            .groupBy(F.col("t2").alias("t"))
            .agg(F.sum("term").cast("long").alias("v"))
        )
        acc = acc.unionByName(v)
    return acc.groupBy(F.col("t").alias("event_type")).agg(
        F.sum("v").cast("long").alias("steps_scaled"),
        (
            F.sum("v").cast("double")
            / F.lit(float(_MK_S_PI))
        ).alias("expected_steps"),
    )


markov_absorption_steps.__doc__ = markov_absorption_steps.__doc__.format(
    a=_AB_TARGET, k=_AB_K
)
