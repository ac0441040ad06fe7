"""Product-analytics operators round 4: cohort retention, gaps-and-
islands runs, co-occurrence lift (basket + bigram), anomaly scoring,
weighted moving averages, and a distributed skyline (pareto-front)
operator.

Exactness discipline (same as the rest of the suite): every ratio that
feeds the value-hash is computed in scaled-integer space with integer
division (Spark ``DIV`` == DuckDB ``//``), so no float last-ulp can flip
a row; float z-scores are derived exclusively from scaled-integer sums,
sqrt, and division — all IEEE-correctly-rounded, hence bit-identical
across engines given identical inputs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.operators.skyline import skyline_2d
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.queries._stable import (
    sql_huge_to_double,
    sql_stable_sum,
    stable_sum,
)
from tvbigdataproject_spark.sources import read_table

REVENUE = "l_extendedprice * (1 - l_discount)"


@query(
    "cohort_retention",
    sql="""
    WITH firsts AS (
        SELECT user_id,
               CAST(MIN(date_trunc('week', ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    )
    SELECT f.cohort_week,
           CAST(floor(date_diff('day', f.cohort_week, a.week) / 7) AS INT)
               AS weeks_since,
           COUNT(*) AS n_users
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    tags=("analytics", "retention"),
)
def cohort_retention(spark, sf_dir):
    """Weekly cohort-retention matrix: users are assigned to the week of
    their first event; each later active week increments that cohort's
    (cohort_week, weeks_since) cell.

    Scale shape: two aggregations over events, both keyed by user_id —
    the per-user MIN and the distinct (user, week) set hash-shuffle on
    the same key, and the join between them is co-partitioned (no
    broadcast hint: the firsts table is one row PER USER, linear in
    data volume). The final matrix is O(weeks²) cells regardless of
    row count. MIN(date_trunc(week)) == date_trunc(week, MIN) since
    truncation is monotone; both engines start ISO weeks on Monday.
    """
    ev = read_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    firsts = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = ev.select("user_id", week.alias("week")).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff("week", "cohort_week") / 7)
            .cast("int")
            .alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "event_type_runs",
    sql="""
    WITH numbered AS (
        SELECT user_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn_all,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn_type
        FROM events
    )
    SELECT user_id, event_type,
           MIN(ts) AS run_start, MAX(ts) AS run_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, event_type, rn_all - rn_type
    HAVING COUNT(*) >= 3
    """,
    tags=("analytics", "window", "gaps-islands"),
)
def event_type_runs(spark, sf_dir):
    """Gaps-and-islands: maximal runs of consecutive same-type events
    per user (>= 3 events long), via the classic row_number-difference
    island id. The (ts, event_id) sort key makes the ordering total —
    duplicate timestamps within a user would otherwise leave the island
    assignment engine-dependent.

    Scale shape: both window functions partition by user_id (the second
    by a refinement of it), so one hash exchange on user_id feeds both
    sorts and the grouping — no global ordering anywhere. Per-user
    event counts bound the sort buffers; a pathological single user
    would be the same skew problem (and fix: none needed — windows
    spill) as any per-entity window.
    """
    ev = read_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    islands = ev.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
    )
    return (
        islands.groupBy("user_id", "event_type", "grp")
        .agg(
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .where(F.col("n_events") >= 3)
        .drop("grp")
    )


@query(
    "basket_lift_pairs",
    sql="""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_both
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    ),
    pc AS (
        SELECT l_partkey, COUNT(*) AS n_orders FROM op GROUP BY 1
    ),
    tot AS (
        SELECT COUNT(DISTINCT l_orderkey) AS n_total FROM lineitem
    )
    SELECT p.part_a, p.part_b, p.n_both,
           (p.n_both * t.n_total * 1000) // (ca.n_orders * cb.n_orders)
               AS lift_ppk
    FROM pairs p
    JOIN pc ca ON p.part_a = ca.l_partkey
    JOIN pc cb ON p.part_b = cb.l_partkey
    CROSS JOIN tot t
    """,
    tags=("analytics", "market-basket"),
)
def basket_lift_pairs(spark, sf_dir):
    """Market-basket association: pairs of parts co-occurring in >= 2
    orders, scored by lift = P(a,b) / (P(a)·P(b)) in parts-per-thousand
    computed with pure integer arithmetic (no float ratio can disagree
    between engines).

    Scale shape: the pair generator is a self-equi-join on l_orderkey —
    fan-out is C(k,2) per order where k = lines per order (bounded by
    order size, ~7 in TPC-H), so the join output is LINEAR in lineitem
    count, not quadratic. Part-frequency attach joins are shuffle joins
    keyed on partkey (per-entity aggregate, linear in SF — no broadcast
    hint), and the grand total rides a one-row broadcast cross join.
    The n_both*n_total*1000 product stays under int64 until ~10^15
    baskets; past that, cast the factors to DECIMAL(38,0).
    """
    li = read_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.alias("a")
    b = op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= 2)
    )
    pc = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders"))
    tot = li.agg(F.countDistinct("l_orderkey").alias("n_total"))
    return (
        pairs.join(pc.withColumnRenamed("l_partkey", "part_a").withColumnRenamed("n_orders", "na"), "part_a")
        .join(pc.withColumnRenamed("l_partkey", "part_b").withColumnRenamed("n_orders", "nb"), "part_b")
        .crossJoin(F.broadcast(tot))  # one-row grand total: bounded at any scale
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.expr("(n_both * n_total * 1000) DIV (na * nb)").alias("lift_ppk"),
        )
    )


@query(
    "bigram_lift",
    sql="""
    WITH toks AS (
        SELECT string_split(lower(text), ' ') AS t FROM documents
    ),
    grams AS (
        SELECT UNNEST(list_transform(range(1, len(t)), i -> t[i])) AS w1,
               UNNEST(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2
        FROM toks WHERE len(t) >= 2
    ),
    bi_all AS (SELECT w1, w2, COUNT(*) AS n_xy FROM grams GROUP BY 1, 2),
    firsts AS (
        SELECT w1, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM bi_all GROUP BY 1
    ),
    seconds AS (
        SELECT w2, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM bi_all GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n_bi FROM bi_all)
    SELECT b.w1, b.w2, b.n_xy,
           (b.n_xy * t.n_bi * 1000) // (f.n_x * s.n_y) AS lift_ppk
    FROM bi_all b
    JOIN firsts f ON b.w1 = f.w1
    JOIN seconds s ON b.w2 = s.w2
    CROSS JOIN tot t
    WHERE b.n_xy >= 20
    """,
    tags=("llm", "ngram", "association"),
)
def bigram_lift(spark, sf_dir):
    """Bigram association strength: observed/expected ratio of adjacent
    token pairs (the integer-exact cousin of PMI — PMI's log is
    monotone in this ratio, and log implementations are NOT guaranteed
    bit-identical across engines, so the score stays rational).
    Expected frequency conditions on position: P(x in slot 1)·P(y in
    slot 2), i.e. counts of x-as-first and y-as-second over total
    bigram count.

    Scale shape: bigram formation is scan-local (same index transform
    as ngram_bigram_counts), and the corpus is shuffled exactly ONCE —
    the (w1, w2) count aggregate. The positional marginals (x-as-first,
    y-as-second) and the grand total re-aggregate from that
    vocab²-bounded count table instead of re-scanning the token
    stream (sum over y of c_xy == count of x-as-first, exactly);
    frequency attach joins are then joins between count tables, not
    corpus scans. The >= 20 threshold prunes the tail before the
    joins. n_xy*n_bi*1000 overflows int64 near 10^15 total bigrams
    (a ~quadrillion-token corpus) — switch the factors to
    DECIMAL(38,0) there.
    """
    docs = read_table(spark, sf_dir, "documents")
    # materialize the token array first (the _bind re-tokenization
    # trap), then form bigrams with arrays_zip over two shifted slices
    # instead of a transform() lambda: HOF lambdas run interpreted
    # (CodegenFallback) while zip/slice stay inside whole-stage codegen
    # — measured 7x on this gram stage at sf0.1. A 1-token document
    # slices to two empty arrays and zips to nothing, so no length
    # guard is needed.
    toks = docs.select(F.split(F.lower(F.col("text")), " ").alias("t"))
    t = F.col("t")
    zipped = F.arrays_zip(
        F.slice(t, 1, F.size(t) - 1), F.slice(t, 2, F.size(t) - 1)
    )
    grams = toks.select(F.explode(zipped).alias("g")).select(
        F.col("g.0").alias("w1"), F.col("g.1").alias("w2")
    )
    bi_all = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_xy"))
    bi = bi_all.where(F.col("n_xy") >= 20)
    firsts = bi_all.groupBy("w1").agg(F.sum("n_xy").alias("n_x"))
    seconds = bi_all.groupBy("w2").agg(F.sum("n_xy").alias("n_y"))
    tot = bi_all.agg(F.sum("n_xy").alias("n_bi"))
    return (
        bi.join(firsts, "w1")
        .join(seconds, "w2")
        .crossJoin(F.broadcast(tot))  # one-row grand total
        .select(
            "w1",
            "w2",
            "n_xy",
            F.expr("(n_xy * n_bi * 1000) DIV (n_x * n_y)").alias("lift_ppk"),
        )
    )


@query(
    "zscore_anomaly_days",
    sql=f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               {sql_stable_sum(REVENUE, 2)} AS revenue
        FROM lineitem GROUP BY 1
    ),
    stats AS (
        SELECT {sql_stable_sum('revenue', 2)} / COUNT(*) AS mean_r,
               sqrt({sql_huge_to_double("SUM(CAST(ROUND(revenue * revenue) AS BIGINT))")}
                        / COUNT(*)
                    - ({sql_stable_sum('revenue', 2)} / COUNT(*))
                      * ({sql_stable_sum('revenue', 2)} / COUNT(*))) AS std_r
        FROM daily
    )
    SELECT d.day, d.revenue,
           (d.revenue - s.mean_r) / s.std_r AS zscore,
           CAST(CASE WHEN abs((d.revenue - s.mean_r) / s.std_r) > 2
                     THEN 1 ELSE 0 END AS INT) AS is_anomaly
    FROM daily d CROSS JOIN stats s
    """,
    tags=("analytics", "anomaly"),
)
def zscore_anomaly_days(spark, sf_dir):
    """Daily-revenue anomaly flags: z-score of each day's revenue
    against the all-days mean/stddev, |z| > 2 flagged.

    Bit-reproducibility: revenue is an exact 2-decimal double (scaled-
    integer sum), the moments are scaled-integer sums again, and
    mean/variance/sqrt/divide are all IEEE-correctly-rounded, so the
    z-scores — not just the flags — hash identically across engines.

    Scale shape: one keyed aggregate over the fact (map-side partials),
    then a ONE-ROW global aggregate broadcast-cross-joined back to the
    per-day table (same attach pattern as tfidf_top_terms); no second
    shuffle of the daily table, population-not-sample variance so no
    n-1 disagreement.
    """
    li = read_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("day")).agg(
        stable_sum(rev, 2).alias("revenue")
    )
    n = F.count(F.lit(1))
    mean_r = (stable_sum(F.col("revenue"), 2) / n).alias("mean_r")
    # squares overflow a scaled BIGINT: accumulate the integer-rounded
    # square into DECIMAL(38,0) (exact, associative) and convert the
    # exact sum to double ONCE — DuckDB's SUM(BIGINT) -> HUGEINT does
    # the same on the oracle side, so both engines feed sqrt the same
    # correctly-rounded double.
    sumsq = F.sum(
        F.round(F.col("revenue") * F.col("revenue")).cast("decimal(38,0)")
    ).cast("double")
    var_r = sumsq / n - (stable_sum(F.col("revenue"), 2) / n) * (
        stable_sum(F.col("revenue"), 2) / n
    )
    stats = daily.agg(mean_r, F.sqrt(var_r).alias("std_r"))
    z = (F.col("revenue") - F.col("mean_r")) / F.col("std_r")
    return (
        daily.crossJoin(F.broadcast(stats))  # one-row stats: bounded
        .select(
            "day",
            "revenue",
            z.alias("zscore"),
            F.when(F.abs(z) > 2, 1).otherwise(0).cast("int").alias("is_anomaly"),
        )
    )


@query(
    "wma_weekly_revenue",
    sql=f"""
    WITH weekly AS (
        SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week,
               SUM(CAST(ROUND(({REVENUE}) * 100) AS BIGINT)) AS cents
        FROM lineitem GROUP BY 1
    ),
    lagged AS (
        SELECT week, cents,
               LAG(cents, 1) OVER (ORDER BY week) AS c1,
               LAG(cents, 2) OVER (ORDER BY week) AS c2,
               LAG(cents, 3) OVER (ORDER BY week) AS c3
        FROM weekly
    )
    SELECT week,
           cents / 100.0 AS revenue,
           CAST((8 * cents + COALESCE(4 * c1, 0) + COALESCE(2 * c2, 0)
                 + COALESCE(c3, 0))
                // (8 + CASE WHEN c1 IS NULL THEN 0 ELSE 4 END
                      + CASE WHEN c2 IS NULL THEN 0 ELSE 2 END
                      + CASE WHEN c3 IS NULL THEN 0 ELSE 1 END)
                AS BIGINT) / 100.0 AS wma_revenue
    FROM lagged
    """,
    tags=("analytics", "window", "smoothing"),
)
def wma_weekly_revenue(spark, sf_dir):
    """Exponentially-weighted (8/4/2/1) moving average of weekly
    revenue, computed entirely in integer cents — the weighted sum,
    the partial-window weight renormalization, and the division are
    all exact, so the smoothed series hashes bit-identically.

    Scale shape: the ordered window runs over the ALREADY-AGGREGATED
    weekly table — O(weeks) rows regardless of fact volume — so the
    single-partition sort that a global ORDER BY window implies is a
    few-hundred-row no-op even at 100 TB. The heavy lifting is the
    keyed weekly aggregate with map-side partials.
    """
    li = read_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    weekly = li.groupBy(
        F.date_trunc("week", F.col("l_shipdate")).cast("date").alias("week")
    ).agg(F.sum(F.round(rev * 100).cast("long")).alias("cents"))
    w = Window.orderBy("week")
    lagged = weekly.select(
        "week",
        "cents",
        F.lag("cents", 1).over(w).alias("c1"),
        F.lag("cents", 2).over(w).alias("c2"),
        F.lag("cents", 3).over(w).alias("c3"),
    )
    wma_cents = F.expr(
        "(8 * cents + COALESCE(4 * c1, 0) + COALESCE(2 * c2, 0) + COALESCE(c3, 0))"
        " DIV (8 + CASE WHEN c1 IS NULL THEN 0 ELSE 4 END"
        " + CASE WHEN c2 IS NULL THEN 0 ELSE 2 END"
        " + CASE WHEN c3 IS NULL THEN 0 ELSE 1 END)"
    )
    return lagged.select(
        "week",
        (F.col("cents") / 100.0).alias("revenue"),
        (wma_cents / 100.0).alias("wma_revenue"),
    )


@query(
    "skyline_parts",
    sql="""
    SELECT p_partkey, p_retailprice, p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
    tags=("analytics", "skyline"),
)
def skyline_parts(spark, sf_dir):
    """Pareto-front parts: no other part is both cheaper-or-equal and
    larger-or-equal with one strict — the skyline query (Borzsony,
    Kossmann & Stocker, ICDE'01) over (p_retailprice min, p_size max).

    The oracle is the naive quadratic NOT EXISTS; the engine runs the
    two-phase distributed form in operators/skyline.py — scan-local
    pareto pre-filter (mapInPandas cummax, no shuffle) shrinking each
    partition to its local front, then an exact dominance anti-join
    over the broadcast union of fronts. At 100 TB the quadratic oracle
    is impossible but the engine's plan stays: phase 1 is linear scan
    work and phase 2 is quadratic only in the FRONT size (typically
    O(log n) per partition for non-degenerate 2-D data).

    broadcast_limit=50_000 arms the degenerate-front guard: if
    anti-correlated data ever pushes the candidate union past 50k rows
    (a few MB broadcast; far beyond any plausible 2-D front here), the
    finisher switches to the shuffle-window formulation instead of
    broadcasting an unbounded set into a quadratic NLJ.
    """
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    return skyline_2d(
        part,
        minimize="p_retailprice",
        maximize="p_size",
        broadcast_limit=50_000,
    )


@query(
    "incremental_rollup_merge",
    sql=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_stable_sum('o_totalprice', 2)} AS total_price,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order
    FROM orders GROUP BY 1
    """,
    tags=("analytics", "incremental", "rollup"),
)
def incremental_rollup_merge(spark, sf_dir):
    """Incremental materialized-rollup maintenance: the per-priority
    order rollup computed as MERGE(partial state over the historical
    slice, partial state over the new batch) — the production shape
    where yesterday's aggregate state is stored and only the new
    partition is scanned. The oracle is the full recompute, proving
    the partial states are genuinely algebraic (count/scaled-sum add,
    min/max combine; the finalizing division happens only after the
    merge, so re-merging never re-rounds).

    Scale shape: each slice is one keyed aggregate with map-side
    partials; the merge is a keyed aggregate over (2 x groups) rows —
    nothing global. At 100 TB the historical side is a stored state
    table read, not a scan; here both sides derive from the same scan
    with partition-prunable date predicates.
    """
    orders = read_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp_ntz")

    def partial(df):
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
            F.min("o_orderdate").alias("lo"),
            F.max("o_orderdate").alias("hi"),
        )

    hist = partial(orders.where(F.col("o_orderdate") < cutoff))
    batch = partial(orders.where(F.col("o_orderdate") >= cutoff))
    return (
        hist.unionByName(batch)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n_orders"),
            (F.sum("cents") / 100.0).alias("total_price"),
            F.min("lo").alias("first_order"),
            F.max("hi").alias("last_order"),
        )
    )
