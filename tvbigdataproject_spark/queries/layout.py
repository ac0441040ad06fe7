"""Data-layout computation tier: Z-order clustering keys.

Companion to the storage-layout tests (tests/test_storage_layout.py —
bucketed co-located joins, partitioned-write pruning): this query tier
computes the LAYOUT KEYS themselves. At 100 TB you don't just read
data, you decide how it lands on disk; a Morton-ordered rewrite of a
fact table is a standard maintenance job (Delta/Iceberg OPTIMIZE
ZORDER) and it is pure engine arithmetic — so it belongs in the
oracle-checked inventory like any other operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.zorder import (
    spread16_sql_ctes,
    z_interleave16,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_ZBUCKET_SHIFT = 16  # drop the low 16 z-bits: one bucket per (x,y) 256x256 tile


@query(
    "zorder_layout_buckets",
    sql=f"""
    WITH {spread16_sql_ctes(
        "o_custkey % 65536",
        "date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))",
        "o_orderkey",
    )}
    SELECT zval >> {_ZBUCKET_SHIFT} AS zbucket,
           COUNT(*) AS n,
           MIN(x) AS cust_min, MAX(x) AS cust_max,
           MIN(y) AS day_min, MAX(y) AS day_max
    FROM zed GROUP BY zbucket
    """,
    tags=("layout", "zorder", "maintenance"),
)
def zorder_layout_buckets(spark, sf_dir):
    """Morton (Z-order) clustering key over orders on (custkey, order
    day) and the per-bucket rectangle it induces: each z-bucket
    (low 16 bits dropped — one bucket per 256x256 tile of the key
    space) covers a bounded range in BOTH dimensions —
    exactly why a z-ordered rewrite lets min/max file statistics prune
    two-predicate scans, where a single-column sort prunes only its
    leading column. The emitted (cust_min..cust_max, day_min..day_max)
    rectangles ARE the file-statistics story; the oracle replays the
    bit-twiddling stage by stage, so the interleave arithmetic is
    value-checked across engines.

    Scale shape: the z-value is scan-stage integer bit-twiddling
    inside whole-stage codegen (no UDF, no join); the bucket summary
    is one 256-group keyed agg. The production maintenance job is
    `df.repartitionByRange(N, zval).sortWithinPartitions(zval)
    .write...` — the key computation here is that job's core.
    """
    orders = read_table(spark, sf_dir, "orders")
    x = (F.col("o_custkey") % 65536).cast("long")
    y = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
    ).cast("long")
    zed = orders.select(
        x.alias("x"), y.alias("y"), z_interleave16(x, y).alias("zval")
    )
    return (
        zed.groupBy(
            F.shiftright("zval", _ZBUCKET_SHIFT).alias("zbucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("cust_min"),
            F.max("x").alias("cust_max"),
            F.min("y").alias("day_min"),
            F.max("y").alias("day_max"),
        )
    )
