"""Statistical analytics, batch 6: rank tests, contingency-table
association, seasonal anomaly flags, and bipartite HITS.

- mann_whitney_u      distributed Mann-Whitney U between two customer
                      segments — tie-corrected ranks via the two-level
                      range-bucket cumulative-sum decomposition (no
                      single-partition global window over the data)
- chi2_lang_source    chi-square independence contributions of the
                      lang x source contingency table (mixture drift
                      detection), exact integer numerators
- dow_seasonal_anomaly  day-of-week seasonal baseline over daily order
                      revenue with cross-multiplied integer deviation
                      flags (the seasonal twin of zscore_anomaly_days)
- hits_scores         two unrolled rounds of unnormalized HITS over the
                      customer->supplier trade bipartite graph — exact
                      integer hub/authority mass

Cross-engine exactness: every rank, count, and deviation test stays in
integer space (doubled average ranks absorb the .5 of tie-averaged
ranks; deviation thresholds are cross-multiplied; day-of-week comes
from epoch-day modulo, not engine-specific DOW functions). The only
doubles are final divisions of already-agreed integers.

Reference parity: the reference's analytics surface stops at grouped
aggregates/windows (SURVEY.md §2.5-2.6); these extend the
beyond-reference statistics tier (ab_test_zscore, mann_kendall_trend,
cusum_changepoint family).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# Mann-Whitney: acctbal cents live in [-99999, 999999]; shifting by
# 100000 makes every value positive so integer div == floor div in both
# engines, and width 4096 keeps the bucket table <= ~269 rows at ANY SF
# (the bucket count is a function of the VALUE DOMAIN, not the data).
_MW_SHIFT = 100_000
_MW_W = 4_096
_MW_A = "BUILDING"
_MW_B = "MACHINERY"


@query(
    "mann_whitney_u",
    sql=f"""
    WITH f AS (
        SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents,
               CASE WHEN c_mktsegment = '{_MW_A}' THEN 1 ELSE 0 END AS ia
        FROM customer
        WHERE c_mktsegment IN ('{_MW_A}', '{_MW_B}')
    ),
    vals AS (
        SELECT cents, CAST(SUM(ia) AS BIGINT) AS n_a,
               COUNT(*) AS n_v
        FROM f GROUP BY cents
    ),
    c AS (
        SELECT cents, n_a, n_v,
               CAST(COALESCE(SUM(n_v) OVER (
                   ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cumbefore
        FROM vals
    ),
    s AS (
        SELECT CAST(SUM(n_a) AS BIGINT) AS n1,
               CAST(SUM(n_v - n_a) AS BIGINT) AS n2,
               CAST(SUM(n_a * (2 * cumbefore + n_v + 1)) AS BIGINT)
                   AS r1_doubled
        FROM c
    )
    SELECT n1, n2, r1_doubled,
           r1_doubled - n1 * (n1 + 1) AS u1_doubled,
           2 * n1 * n2 - (r1_doubled - n1 * (n1 + 1)) AS u2_doubled,
           CAST(r1_doubled - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1
    FROM s
    """,
    tags=("analytics", "stats", "ranktest"),
)
def mann_whitney_u(spark, sf_dir):
    """Mann-Whitney U (Wilcoxon rank-sum) between the BUILDING and
    MACHINERY customer segments on account balance: the nonparametric
    two-sample location test (ab_test_zscore's rank-based sibling —
    robust to the heavy tails a mean test is not).

    Tie handling is the textbook average rank, carried as DOUBLED ranks
    so everything stays integer: a value block with n_v rows starting
    after ``cumbefore`` predecessors has doubled average rank
    ``2*cumbefore + n_v + 1``. U1 = R1 - n1(n1+1)/2, doubled
    throughout; the single double is the final halving.

    Scale shape: ranking uses NO global data window. Values collapse to
    a per-cents aggregate (bounded by the 1.1M-value acctbal DOMAIN,
    not the row count), then the global cumulative count decomposes
    into range buckets of width 4096: one bounded window over <= 269
    bucket totals + one window partitioned BY bucket — the
    global_row_numbers offsets trick applied to tied ranks.
    """
    cust = read_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin(_MW_A, _MW_B)
    )
    vals = (
        cust.select(
            F.round(F.col("c_acctbal") * 100)
            .cast("long")
            .alias("cents"),
            F.when(F.col("c_mktsegment") == _MW_A, 1)
            .otherwise(0)
            .alias("ia"),
        )
        .groupBy("cents")
        .agg(
            F.sum("ia").cast("long").alias("n_a"),
            F.count(F.lit(1)).alias("n_v"),
        )
        .withColumn(
            "_b", F.expr(f"(cents + {_MW_SHIFT}) div {_MW_W}")
        )
    )
    bucket_tot = vals.groupBy("_b").agg(F.sum("n_v").alias("_t"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_tot.select(
        "_b",
        F.coalesce(F.sum("_t").over(w_off), F.lit(0).cast("long")).alias(
            "_off"
        ),
    )
    w_in = (
        Window.partitionBy("_b")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = vals.join(F.broadcast(offsets), "_b").select(
        "cents",
        "n_a",
        "n_v",
        (
            F.col("_off")
            + F.coalesce(F.sum("n_v").over(w_in), F.lit(0).cast("long"))
        ).alias("cumbefore"),
    )
    s = c.agg(
        F.sum("n_a").cast("long").alias("n1"),
        F.sum(F.col("n_v") - F.col("n_a")).cast("long").alias("n2"),
        F.sum(
            F.col("n_a")
            * (2 * F.col("cumbefore") + F.col("n_v") + 1)
        )
        .cast("long")
        .alias("r1_doubled"),
    )
    u1d = F.col("r1_doubled") - F.col("n1") * (F.col("n1") + 1)
    return s.select(
        "n1",
        "n2",
        "r1_doubled",
        u1d.alias("u1_doubled"),
        (2 * F.col("n1") * F.col("n2") - u1d).alias("u2_doubled"),
        (u1d.cast("double") / 2.0).alias("u1"),
    )


@query(
    "chi2_lang_source",
    sql="""
    WITH counts AS (
        SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2
    ),
    m AS (
        SELECT lang, source, n,
               CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS r_l,
               CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT) AS c_s,
               CAST(SUM(n) OVER () AS BIGINT) AS nn
        FROM counts
    )
    SELECT lang, source, n, r_l, c_s,
           CAST((nn * n - r_l * c_s) * (nn * n - r_l * c_s) AS DOUBLE)
               / CAST(nn * r_l * c_s AS DOUBLE) AS chi2_cell
    FROM m
    """,
    tags=("analytics", "stats", "mixture"),
)
def chi2_lang_source(spark, sf_dir):
    """Chi-square independence contributions of the lang x source
    contingency table: cell (l, s) contributes (N*n - r*c)^2 / (N*r*c)
    (the (o-e)^2/e term with the fractional expectation e = r*c/N
    cleared by cross-multiplication). Summing chi2_cell gives the test
    statistic; per-cell values localize WHICH domain drifted — the
    mixture-drift monitor a curation pipeline alarms on.

    All products stay integer until the single final division; at
    corpus scales where N*n exceeds 2^63 the same expression lifts to
    DECIMAL(38,0) (the engine's standard wide-accumulator move). Every
    window runs over the contingency table itself — bounded by
    langs x sources, dozens of rows at any corpus size.
    """
    counts = (
        read_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = counts.select(
        "lang",
        "source",
        "n",
        F.sum("n").over(Window.partitionBy("lang")).cast("long").alias("r_l"),
        F.sum("n")
        .over(Window.partitionBy("source"))
        .cast("long")
        .alias("c_s"),
        F.sum("n").over(Window.partitionBy()).cast("long").alias("nn"),
    )
    d = F.col("nn") * F.col("n") - F.col("r_l") * F.col("c_s")
    return m.select(
        "lang",
        "source",
        "n",
        "r_l",
        "c_s",
        (
            (d * d).cast("double")
            / (F.col("nn") * F.col("r_l") * F.col("c_s")).cast("double")
        ).alias("chi2_cell"),
    )


@query(
    "dow_seasonal_anomaly",
    sql="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS x_cents
        FROM orders GROUP BY 1
    ),
    d AS (
        SELECT day, x_cents,
               CAST((day - DATE '1970-01-01') % 7 AS BIGINT) AS dow_idx
        FROM daily
    ),
    base AS (
        SELECT dow_idx, COUNT(*) AS dow_days,
               CAST(SUM(x_cents) AS BIGINT) AS dow_sum_cents
        FROM d GROUP BY 1
    )
    SELECT d.day, d.dow_idx, d.x_cents, b.dow_days, b.dow_sum_cents,
           d.x_cents * b.dow_days > 2 * b.dow_sum_cents AS flag_hi,
           2 * d.x_cents * b.dow_days < b.dow_sum_cents AS flag_lo
    FROM d JOIN base b USING (dow_idx)
    """,
    tags=("analytics", "timeseries", "anomaly"),
)
def dow_seasonal_anomaly(spark, sf_dir):
    """Day-of-week seasonal anomaly flags over daily order revenue:
    a day is flagged high when it exceeds 2x its weekday's mean and low
    under 0.5x — the seasonal-baseline twin of zscore_anomaly_days
    (which uses a GLOBAL mean and so mislabels ordinary weekend dips).

    Exactness: the weekday index is epoch-day modulo 7 (1970-01-01 was
    a Thursday; index 0 = Thu) — engine DOW functions disagree on
    week-start conventions, integer date arithmetic does not. The
    2x/0.5x tests are cross-multiplied (x*n_d vs 2*s_d), so no division
    ever happens: flags are exact integer comparisons.

    Scale shape: the corpus scan collapses map-side into the daily
    grid; the 7-row weekday baseline broadcasts back over it.
    """
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("x_cents")
        )
    )
    d = daily.select(
        "day",
        "x_cents",
        (F.datediff(F.col("day"), F.lit("1970-01-01")) % 7)
        .cast("long")
        .alias("dow_idx"),
    )
    base = d.groupBy("dow_idx").agg(
        F.count(F.lit(1)).alias("dow_days"),
        F.sum("x_cents").cast("long").alias("dow_sum_cents"),
    )
    return d.join(F.broadcast(base), "dow_idx").select(
        "day",
        "dow_idx",
        "x_cents",
        "dow_days",
        "dow_sum_cents",
        (F.col("x_cents") * F.col("dow_days") > 2 * F.col("dow_sum_cents"))
        .alias("flag_hi"),
        (2 * F.col("x_cents") * F.col("dow_days") < F.col("dow_sum_cents"))
        .alias("flag_lo"),
    )


@query(
    "hits_scores",
    sql="""
    WITH e AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    a1 AS (SELECT s, COUNT(*) AS a1 FROM e GROUP BY s),
    h1 AS (
        SELECT e.c, CAST(SUM(a1.a1) AS BIGINT) AS h1
        FROM e JOIN a1 USING (s) GROUP BY e.c
    ),
    a2 AS (
        SELECT e.s, CAST(SUM(h1.h1) AS BIGINT) AS a2
        FROM e JOIN h1 USING (c) GROUP BY e.s
    )
    SELECT a1.s AS suppkey, CAST(a1.a1 AS BIGINT) AS auth1, a2.a2 AS auth2
    FROM a1 JOIN a2 USING (s)
    """,
    tags=("graph", "centrality", "iterative"),
)
def hits_scores(spark, sf_dir):
    """Two unrolled rounds of unnormalized HITS (Kleinberg) over the
    customer -> supplier trade bipartite graph: auth1(s) = in-degree
    (round-1 authority mass with unit hubs), auth2(s) = sum over
    buying customers of THEIR round-1 hub mass h1(c) = sum of auth1
    over c's suppliers. Unnormalized integer mass keeps every round
    bit-exact in both engines (classic HITS normalizes by the L2 norm
    each round — a global sqrt that changes no RANKING, so the exact
    integer form is the oracle-checkable one; PageRank's dyadic-weight
    discipline, applied to the hub/authority recursion).

    Scale shape: each round is one keyed join + partial-aggregated
    groupBy on entity-sized tables — the same shuffle geometry as
    pagerank_trade_graph, with rounds unrolled because two suffice for
    the ranking to stabilize on bipartite trade graphs.
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    e = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .distinct()
    )
    a1 = e.groupBy("s").agg(F.count(F.lit(1)).alias("a1"))
    h1 = (
        e.join(a1, "s")
        .groupBy("c")
        .agg(F.sum("a1").cast("long").alias("h1"))
    )
    a2 = (
        e.join(h1, "c")
        .groupBy("s")
        .agg(F.sum("h1").cast("long").alias("a2"))
    )
    return a1.join(a2, "s").select(
        F.col("s").alias("suppkey"),
        F.col("a1").cast("long").alias("auth1"),
        F.col("a2").alias("auth2"),
    )
