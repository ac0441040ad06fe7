"""Storage-layout levers for 100 TB: bucketed tables co-locate joins
(no exchange), partitioned writes prune at the source. Verified from
the physical plans, not just the results."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from tvbigdataproject_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.001"


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # lands in ./spark-warehouse (gitignored); warehouse.dir is a static
    # conf and cannot be pointed at a tmpdir post-startup
    orders = read_table(spark, SF_DIR, "orders")
    li = read_table(spark, SF_DIR, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_needs_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    orders = spark.table(ot)
    li = spark.table(lt)
    joined = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
    plan = _explain(joined)
    # both sides pre-bucketed on the join key: a co-located sort-merge
    # join with no Exchange anywhere — this is what bucketing buys at
    # fact-fact scale (the shuffle is paid once, at write time)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    # and it returns the same rows as the shuffled join
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert joined.count() == plain.count()


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    out = str(tmp_path / "events_by_type")
    read_table(spark, SF_DIR, "events").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(out)
    df = spark.read.parquet(out).where(F.col("event_type") == "click")
    plan = _explain(df)
    # the predicate must land in PartitionFilters (directory pruning),
    # not as a row-level data filter
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "event_type" in pf
    n_click = read_table(spark, SF_DIR, "events").where(
        F.col("event_type") == "click"
    ).count()
    assert df.count() == n_click
