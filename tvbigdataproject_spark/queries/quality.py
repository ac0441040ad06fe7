"""Data-quality operators: a dbt-style checks table and robust
(median-based) dispersion statistics.

- dq_orders_checks        one pass of declarative data tests over the
                          orders/customer/lineitem universe — null
                          rates, referential integrity, key uniqueness,
                          domain and range violations — returned as a
                          (check_name, n_violations) table. The shape a
                          warehouse runs nightly on every fact load.
- mad_acctbal_by_segment  median absolute deviation per segment: the
                          outlier-robust dispersion measure (stddev is
                          dominated by the tails it is supposed to
                          flag). Two grouped percentile passes with a
                          broadcast median attach between them.

Every check counts in exact integer space; the MAD relies on the same
cross-engine percentile-interpolation agreement as
decile_assign_range_join (h = p*(n-1) over identical value sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "dq_orders_checks",
    sql="""
    SELECT 'orders_null_custkey' AS check_name,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders_fk_customer',
           CAST(COUNT(*) AS BIGINT)
    FROM orders WHERE NOT EXISTS (
        SELECT 1 FROM customer WHERE c_custkey = o_custkey)
    UNION ALL
    SELECT 'orders_pk_unique',
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
    FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders
          GROUP BY o_orderkey HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'orders_priority_domain',
           CAST(SUM(CASE WHEN o_orderpriority NOT IN
                ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_nonneg_total',
           CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE NOT EXISTS (
        SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.5
                THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    """,
    tags=("quality", "dq", "integrity"),
)
def dq_orders_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite over one load: null checks,
    referential integrity (anti joins), primary-key uniqueness (grouped
    surplus count), domain membership, and range checks, emitted as one
    (check_name, n_violations) table.

    Shapes by check class: null/domain/range checks are conditional
    sums folded into ONE scan per table (orders' four single-table
    checks share a single pass via a multi-aggregate — not four scans);
    FK checks are LEFT ANTI joins keyed on the FK (the join's natural
    shuffle, dim side projected to its key column); uniqueness is a
    grouped count emitting surplus rows (sum(n-1), an exact integer).
    At 100 TB each check stays one keyed pass; the union glues
    seven one-row results, which is free.
    """
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    li = read_table(spark, sf_dir, "lineitem")

    def one(name: str, cnt) -> DataFrame:
        return cnt.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    prio_ok = F.col("o_orderpriority").isin(
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
    )
    # one scan, four conditional aggregates
    scans = o.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("nulls"),
        F.sum(F.when(~prio_ok, 1).otherwise(0)).alias("domain"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias("range"),
    )
    fk_cust = one(
        "orders_fk_customer",
        o.join(c, F.col("c_custkey") == F.col("o_custkey"), "left_anti").agg(
            F.count(F.lit(1)).alias("n")
        ),
    )
    pk = one(
        "orders_pk_unique",
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 1)
        .agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("n")),
    )
    fk_li = one(
        "lineitem_fk_orders",
        li.join(
            o.select("o_orderkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("n")),
    )
    disc = one(
        "lineitem_discount_range",
        li.agg(
            F.sum(
                F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5), 1)
                .otherwise(0)
            ).alias("n")
        ),
    )
    return (
        one("orders_null_custkey", scans.select(F.col("nulls").alias("n")))
        .unionAll(fk_cust)
        .unionAll(pk)
        .unionAll(
            one("orders_priority_domain", scans.select(F.col("domain").alias("n")))
        )
        .unionAll(one("orders_nonneg_total", scans.select(F.col("range").alias("n"))))
        .unionAll(fk_li)
        .unionAll(disc)
    )


@query(
    "mad_acctbal_by_segment",
    sql="""
    WITH med AS (
        SELECT c_mktsegment, quantile_cont(c_acctbal, 0.5) AS m
        FROM customer GROUP BY c_mktsegment
    )
    SELECT customer.c_mktsegment,
           COUNT(*) AS n,
           MIN(m) AS med_acctbal,
           quantile_cont(abs(c_acctbal - m), 0.5) AS mad
    FROM customer JOIN med ON customer.c_mktsegment = med.c_mktsegment
    GROUP BY customer.c_mktsegment
    """,
    tags=("quality", "robust-stats", "percentile"),
)
def mad_acctbal_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation of account balance per market segment —
    the robust dispersion measure monitoring dashboards should use
    where stddev is dragged by the very outliers it is meant to flag.

    Two grouped percentile passes with a broadcast attach between: the
    per-segment median (bounded groups → tiny cuts table), joined back
    to compute |x - m|, then the grouped median of those deviations.
    Cross-engine the medians interpolate between identical order
    statistics with the same h = p*(n-1) rule (the
    decile_assign_range_join reliance); the deviation arithmetic is the
    same subtraction in both engines.
    """
    c = read_table(spark, sf_dir, "customer")
    med = c.groupBy("c_mktsegment").agg(
        F.percentile("c_acctbal", 0.5).alias("m")
    )
    return (
        c.join(F.broadcast(med), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("m").alias("med_acctbal"),
            F.percentile(F.abs(F.col("c_acctbal") - F.col("m")), 0.5).alias("mad"),
        )
    )


@query(
    "k_anonymity_audit",
    sql="""
    SELECT c_nationkey AS nation, c_mktsegment AS segment,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
           COUNT(*) AS n_members,
           COUNT(DISTINCT c_name) AS l_distinct_names
    FROM customer
    GROUP BY c_nationkey, c_mktsegment, FLOOR(c_acctbal / 1000)
    HAVING COUNT(*) < 5
    """,
    tags=("quality", "privacy", "k-anonymity"),
)
def k_anonymity_audit(spark, sf_dir):
    """Privacy audit before a data release: every quasi-identifier
    group (nation x segment x coarse balance band) smaller than k=5,
    with its l-diversity (distinct sensitive values — here the name
    column) — the groups where a joiner with external knowledge can
    re-identify individuals. Training-data and analytics releases run
    exactly this gate; rows in these groups get suppressed or
    generalized before export.

    Determinism: the band edge FLOOR(bal/1000) divides a 2-decimal
    value by an exact constant — identical on both engines (negative
    balances floor toward -inf in both); counts are integers.

    Scale shape: one keyed agg over the quasi-identifier tuple with
    map-side partials + a HAVING filter; the audit output is bounded
    by the number of small groups, which is the point.
    """
    cust = read_table(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / 1000).alias("bal_band"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.countDistinct("c_name").alias("l_distinct_names"),
        )
        .where(F.col("n_members") < 5)
    )


@query(
    "t_closeness_audit",
    sql="""
    WITH base AS (
        SELECT c_nationkey AS nation, c_mktsegment AS segment,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS band
        FROM customer
    ),
    bands AS (SELECT DISTINCT band FROM base),
    groups AS (
        SELECT nation, segment, CAST(COUNT(*) AS BIGINT) AS n_g
        FROM base GROUP BY 1, 2
    ),
    cnt AS (
        SELECT nation, segment, band, CAST(COUNT(*) AS BIGINT) AS c
        FROM base GROUP BY 1, 2, 3
    ),
    grid AS (
        SELECT g.nation, g.segment, g.n_g, b.band,
               COALESCE(cnt.c, 0) AS c
        FROM groups g CROSS JOIN bands b
        LEFT JOIN cnt ON cnt.nation = g.nation
                     AND cnt.segment = g.segment AND cnt.band = b.band
    ),
    cums AS (
        SELECT nation, segment, n_g, band,
               CAST(SUM(c) OVER (
                   PARTITION BY nation, segment ORDER BY band
               ) AS BIGINT) AS cum_g
        FROM grid
    ),
    gcum AS (
        SELECT band, CAST(SUM(cum_g) AS BIGINT) AS cum_all
        FROM cums GROUP BY band
    ),
    dd AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM bands),
    emd AS (
        SELECT c.nation, c.segment, MAX(c.n_g) AS n_g,
               CAST(SUM(ABS(c.cum_g * t.n - g.cum_all * c.n_g))
                    AS BIGINT) AS num
        FROM cums c
        JOIN gcum g ON g.band = c.band
        CROSS JOIN (SELECT CAST(SUM(n_g) AS BIGINT) AS n FROM groups) t
        GROUP BY c.nation, c.segment
    )
    SELECT e.nation, e.segment, e.n_g, e.num,
           1000000 * e.num
               // (e.n_g * (SELECT CAST(SUM(n_g) AS BIGINT) FROM groups)
                   * (dd.d - 1)) AS t_closeness_ppm
    FROM emd e CROSS JOIN dd
    """,
    tags=("quality", "privacy", "audit"),
)
def t_closeness_audit(spark, sf_dir):
    """t-closeness of each (nation, segment) quasi-identifier group
    over the ordered account-balance band — the third leg of the
    privacy-audit trio (k_anonymity_audit counts group sizes,
    l_diversity_audit counts sensitive diversity; t-closeness asks
    whether a group's SENSITIVE DISTRIBUTION leaks: a group whose
    balance profile diverges from the global one identifies its
    members even when k and l look safe). For an ordered attribute the
    distance is the normalized Earth Mover's Distance = mean absolute
    cumulative-share gap over the domain steps.

    Exactness: per-band cumulative counts are exact integers
    (grid-filled so every group covers the full band domain); the EMD
    numerator is Sum |cum_g*N - cum_all*n_g| — exact int64 well past
    sf10 — and t_ppm is one integer floor quotient by n_g*N*(D-1).

    Scale shape: one scan to (QI, band) counts with map-side partials;
    everything after runs on the bounded QI-group x band-domain grid
    (the cross join is bounded x bounded — intended NLJ); cumulative
    windows partition by group.
    """
    from pyspark.sql import Window as W

    cust = read_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("band"),
    )
    bands = base.select("band").distinct()
    groups = base.groupBy("nation", "segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_g")
    )
    cnt = base.groupBy("nation", "segment", "band").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    grid = (
        groups.crossJoin(F.broadcast(bands))
        .join(cnt, ["nation", "segment", "band"], "left")
        .select(
            "nation",
            "segment",
            "n_g",
            "band",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    wcum = W.partitionBy("nation", "segment").orderBy("band")
    cums = grid.select(
        "nation",
        "segment",
        "n_g",
        "band",
        F.sum("c").over(wcum).cast("long").alias("cum_g"),
    )
    gcum = cums.groupBy("band").agg(
        F.sum("cum_g").cast("long").alias("cum_all")
    )
    tot = groups.agg(F.sum("n_g").cast("long").alias("n"))
    dd = bands.agg(F.count(F.lit(1)).cast("long").alias("d"))
    emd = (
        cums.join(F.broadcast(gcum), "band")
        .crossJoin(F.broadcast(tot))
        .groupBy("nation", "segment")
        .agg(
            F.max("n_g").alias("n_g"),
            F.sum(
                F.abs(
                    F.col("cum_g") * F.col("n")
                    - F.col("cum_all") * F.col("n_g")
                )
            )
            .cast("long")
            .alias("num"),
        )
    )
    return (
        emd.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(dd))
        .select(
            "nation",
            "segment",
            "n_g",
            "num",
            F.expr(
                "(1000000 * num) div (n_g * n * (d - 1))"
            ).alias("t_closeness_ppm"),
        )
    )
