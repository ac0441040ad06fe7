"""Data-quality & maintenance audits, batch 2: referential integrity,
l-diversity, Benford first digits, and compaction bin planning.

- fk_integrity_audit   orphan counts for every FK edge of the schema in
                       one pass — the referential-integrity DQ check
                       (dq_orders_checks covers row-local predicates;
                       this covers the cross-table ones)
- l_diversity_audit    distinct-sensitive-value count per
                       quasi-identifier group (the l-diversity
                       companion to k_anonymity_audit)
- benford_first_digit  first-significant-digit histogram of order
                       totals vs Benford expectation in exact ppm —
                       the classic bulk-data fraud/synthesis screen
- compaction_bins      next-fit file-compaction plan over simulated
                       small files: running-byte bins via the bounded
                       two-level cumulative-sum decomposition

Every audit is exact integer arithmetic end to end; shares are ppm
integer quotients, never float ratios. Reference parity: the
reference's DQ surface is row-predicate checks on its CSV exports;
cross-table and distribution audits are beyond-reference DQ tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def _fk_sql_arm(child, ckey, parent, pkey) -> str:
    return f"""
    SELECT '{child}.{ckey}->{parent}.{pkey}' AS relation,
           CAST(SUM(n) AS BIGINT) AS n_child,
           CAST(SUM(CASE WHEN p.k IS NULL THEN n ELSE 0 END) AS BIGINT)
               AS n_orphan
    FROM (SELECT {ckey} AS k, COUNT(*) AS n FROM {child} GROUP BY 1) c
    LEFT JOIN (SELECT DISTINCT {pkey} AS k FROM {parent}) p USING (k)
    """


@query(
    "fk_integrity_audit",
    sql="\nUNION ALL\n".join(
        _fk_sql_arm(*edge) for edge in _FK_EDGES
    ),
    tags=("dq", "audit", "join"),
)
def fk_integrity_audit(spark, sf_dir):
    """Referential-integrity audit of all seven FK edges of the schema:
    per edge, total child rows and rows whose key has no parent. A
    synthetic-clean dataset reports 0 orphans everywhere; in production
    this is the landing-zone gate before joins silently drop rows
    (inner joins HIDE orphans — this measures them).

    Scale shape: each edge first collapses the child to per-key counts
    (map-side partials — the join then carries one row per DISTINCT
    key, not per child row), left-joins the parent's key set, and
    reduces to ONE row; the seven 1-row results union. No cross join
    anywhere: orphan and total counts come out of the same aggregate.
    """
    tables = {
        name: read_table(spark, sf_dir, name)
        for name in {
            t for child, _, parent, _ in _FK_EDGES for t in (child, parent)
        }
    }

    def arm(child, ckey, parent, pkey) -> DataFrame:
        ck = (
            tables[child]
            .groupBy(F.col(ckey).alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        pk = tables[parent].select(F.col(pkey).alias("k")).distinct()
        joined = ck.join(pk.withColumn("_hit", F.lit(1)), "k", "left")
        return joined.agg(
            F.sum("n").cast("long").alias("n_child"),
            F.sum(F.when(F.col("_hit").isNull(), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_orphan"),
        ).select(
            F.lit(f"{child}.{ckey}->{parent}.{pkey}").alias("relation"),
            "n_child",
            "n_orphan",
        )

    arms = [arm(*edge) for edge in _FK_EDGES]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


@query(
    "l_diversity_audit",
    sql="""
    WITH t AS (
        SELECT c_mktsegment AS segment, c_nationkey AS nationkey,
               (CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000)
                   // 100000 AS band
        FROM customer
    )
    SELECT segment, nationkey,
           COUNT(*) AS k_size,
           CAST(COUNT(DISTINCT band) AS BIGINT) AS l_distinct,
           COUNT(DISTINCT band) >= 3 AS l3_ok
    FROM t GROUP BY 1, 2
    """,
    tags=("dq", "privacy", "audit"),
)
def l_diversity_audit(spark, sf_dir):
    """l-diversity audit: for each quasi-identifier group (segment,
    nation), the count of DISTINCT sensitive values (account-balance
    band of width $1000) and whether it meets l >= 3 — the
    k_anonymity_audit companion that catches the attack k-anonymity
    misses (a large group whose sensitive value is constant leaks it).

    The band shifts cents by +100000 before integer division so the
    negative-balance rows floor identically in both engines (Spark div
    truncates toward zero, DuckDB // floors — they agree only on
    non-negative operands; the capped_running_balance shift trick).

    Scale shape: one grouped count-distinct per QI group — partial
    aggregation all the way; group count bounded by segments x nations.
    """
    t = read_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
        F.expr(
            "(cast(round(c_acctbal * 100) as bigint) + 100000) div 100000"
        ).alias("band"),
    )
    return t.groupBy("segment", "nationkey").agg(
        F.count(F.lit(1)).alias("k_size"),
        F.countDistinct("band").cast("long").alias("l_distinct"),
        (F.countDistinct("band") >= 3).alias("l3_ok"),
    )


# Benford expected first-digit shares, log10(1 + 1/d) in exact ppm —
# integer LITERALS, so no engine evaluates a logarithm
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


@query(
    "benford_first_digit",
    sql=f"""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders
    ),
    h AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit)
    SELECT digit, n,
           CAST((1000000 * n) // (SUM(n) OVER ()) AS BIGINT) AS share_ppm,
           CAST(CASE digit
               {' '.join(f'WHEN {k} THEN {v}' for k, v in _BENFORD_PPM.items())}
           END AS BIGINT) AS benford_ppm,
           CAST((1000000 * n) // (SUM(n) OVER ()) AS BIGINT)
               - CAST(CASE digit
               {' '.join(f'WHEN {k} THEN {v}' for k, v in _BENFORD_PPM.items())}
           END AS BIGINT) AS dev_ppm
    FROM h
    """,
    tags=("dq", "stats", "audit"),
)
def benford_first_digit(spark, sf_dir):
    """First-significant-digit histogram of order totals against the
    Benford expectation, in exact parts-per-million: the one-pass
    screen for fabricated or re-synthesized bulk data (organic
    multiplicative amounts follow log10(1+1/d); uniform synthetics do
    not — and TPC-H totals are exactly such a synthetic, so the
    deviations HERE are the interesting output).

    Exactness: the digit comes from the decimal STRING of the integer
    cents (integer-to-string is engine-portable; double-to-string is
    not), shares are integer ppm quotients, and the Benford targets are
    precomputed integer literals — no engine ever evaluates a log.

    Scale shape: corpus scan collapses map-side to <= 9 digit rows; the
    ppm window runs over those 9.
    """
    benford = F.create_map(
        *[F.lit(x) for kv in _BENFORD_PPM.items() for x in kv]
    )
    d = read_table(spark, sf_dir, "orders").select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    h = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return h.select(
        "digit",
        "n",
        F.expr("1000000 * n").alias("_num"),
        total.alias("_tot"),
        benford[F.col("digit")].cast("long").alias("benford_ppm"),
    ).select(
        "digit",
        "n",
        F.expr("_num div _tot").cast("long").alias("share_ppm"),
        "benford_ppm",
        (F.expr("_num div _tot").cast("long") - F.col("benford_ppm")).alias(
            "dev_ppm"
        ),
    )


_CB_FILE_KEYS = 512     # orderkeys per simulated file
_CB_BUCKET = 64         # files per offsets bucket
_CB_TARGET = 32_768     # compaction target bytes per bin


@query(
    "compaction_bins",
    sql=f"""
    WITH files AS (
        SELECT o_orderkey // {_CB_FILE_KEYS} AS file_id,
               CAST(SUM(length(o_orderpriority) + length(o_orderstatus)
                        + 16) AS BIGINT) AS bytes
        FROM orders GROUP BY 1
    ),
    c AS (
        SELECT file_id, bytes,
               CAST(COALESCE(SUM(bytes) OVER (
                   ORDER BY file_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum_before
        FROM files
    ),
    plan AS (
        SELECT file_id, bytes, cum_before // {_CB_TARGET} AS bin FROM c
    )
    SELECT bin, COUNT(*) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes,
           MIN(file_id) AS first_file, MAX(file_id) AS last_file
    FROM plan GROUP BY bin
    """,
    tags=("maintenance", "layout", "sequence"),
)
def compaction_bins(spark, sf_dir):
    """Small-file compaction plan: simulated files (one per 512-key
    range of orders, sized by payload bytes) are packed key-order into
    ~32 KiB bins by the next-fit rule bin = floor(running_bytes /
    target) — the planning pass a table-maintenance service runs before
    rewriting small files, keeping key ranges contiguous so data
    skipping survives the rewrite (zorder_layout_buckets' companion).

    Scale shape: the file inventory is metadata-scale but still grows
    with the table, so the running sum uses NO global data window: the
    two-level decomposition (per-64-file bucket totals -> bounded
    offsets window -> within-bucket partitioned window) — the
    global_row_numbers trick on bytes instead of row counts.
    """
    files = (
        read_table(spark, sf_dir, "orders")
        .groupBy(
            F.expr(f"o_orderkey div {_CB_FILE_KEYS}").alias("file_id")
        )
        .agg(
            F.sum(
                F.length("o_orderpriority")
                + F.length("o_orderstatus")
                + F.lit(16)
            )
            .cast("long")
            .alias("bytes")
        )
        .withColumn("_b", F.expr(f"file_id div {_CB_BUCKET}"))
    )
    bucket_tot = files.groupBy("_b").agg(F.sum("bytes").alias("_t"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_tot.select(
        "_b",
        F.coalesce(F.sum("_t").over(w_off), F.lit(0).cast("long")).alias(
            "_off"
        ),
    )
    w_in = (
        Window.partitionBy("_b")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.col("_off") + F.coalesce(
        F.sum("bytes").over(w_in), F.lit(0).cast("long")
    )
    plan = files.join(F.broadcast(offsets), "_b").select(
        "file_id",
        "bytes",
        cum_before.alias("_cum"),
    ).select(
        "file_id",
        "bytes",
        F.expr(f"_cum div {_CB_TARGET}").alias("bin"),
    )
    return plan.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").cast("long").alias("total_bytes"),
        F.min("file_id").alias("first_file"),
        F.max("file_id").alias("last_file"),
    )
