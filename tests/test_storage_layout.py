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


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    # DPP: the fact side is partitioned by a join key; the selective
    # filter sits on the DIM side only. At 100 TB this is the difference
    # between scanning every date partition and scanning the few the
    # filtered dim reaches — Catalyst inserts a runtime subquery filter
    # on the fact scan (dynamicpruning expression) with zero query
    # changes.
    fact = str(tmp_path / "orders_by_priority")
    read_table(spark, SF_DIR, "orders").write.mode("overwrite").partitionBy(
        "o_orderpriority"
    ).parquet(fact)
    dim = spark.createDataFrame(
        [("1-URGENT", "hot"), ("5-LOW", "cold")], ["prio", "tier"]
    )
    joined = (
        spark.read.parquet(fact)
        .join(dim, F.col("o_orderpriority") == F.col("prio"))
        .where(F.col("tier") == "hot")
    )
    plan = _explain(joined)
    assert "dynamicpruning" in plan.lower(), plan
    want = (
        read_table(spark, SF_DIR, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )
    assert joined.count() == want


def test_range_clustered_write_skips_row_groups(spark, tmp_path):
    # repartitionByRange + sortWithinPartitions clusters the data so a
    # range predicate maps to a few files/row-groups (parquet min-max
    # skipping) instead of all of them — the sort-order lever for
    # time-series and key-range scans at 100 TB.
    out = str(tmp_path / "lineitem_clustered")
    (
        read_table(spark, SF_DIR, "lineitem")
        .repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    df = spark.read.parquet(out).where(F.col("l_orderkey") < 100)
    plan = _explain(df)
    # the range predicate must be pushed to the parquet reader
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "LessThan(l_orderkey" in pushed
    want = (
        read_table(spark, SF_DIR, "lineitem").where(F.col("l_orderkey") < 100).count()
    )
    assert df.count() == want


def test_orc_roundtrip_preserves_values(spark, tmp_path):
    # format coverage beyond parquet: ORC is the other columnar format a
    # lakehouse ingests; write/read must preserve schema and values
    # exactly (timestamps included — orders carries timestamp_ntz)
    src = read_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert back.count() == src.count()
    a = {tuple(r) for r in src.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_jsonlines_roundtrip_with_explicit_schema(spark, tmp_path):
    # JSON-lines sink/source with schema-on-read: reading back through
    # the WRITTEN schema (not inference) is the production contract —
    # inference over JSON silently widens/narrows types
    src = read_table(spark, SF_DIR, "customer")
    path = str(tmp_path / "customer_jsonl")
    src.write.mode("overwrite").json(path)
    back = spark.read.schema(src.schema).json(path)
    assert back.schema == src.schema
    a = {tuple(r) for r in src.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_runtime_bloom_filter_prunes_fact_side(spark):
    # Runtime-filter scale lever: a selective dim-side predicate should
    # inject a bloom MightContain filter onto the fact scan, pruning
    # rows before the join shuffle. The trigger thresholds are sized
    # for the real regime (application side >= 10GB scan), so the test
    # lowers them to simulate it at test SF; production sessions keep
    # the defaults and get the filter exactly when the scan is big
    # enough for it to matter.
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = read_table(spark, SF_DIR, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = read_table(spark, SF_DIR, "lineitem")
        plan = _explain(
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        assert "might_contain" in plan.lower(), plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_dynamic_partition_pruning_injects_runtime_filter(spark, tmp_path):
    # date-partitioned fact + runtime-filtered dim: the optimizer must
    # inject a dynamicpruning expression into the fact scan's
    # PartitionFilters — at 100 TB this is the difference between
    # scanning two months and scanning the table. (DPP needs the dim
    # filter to be non-foldable at plan time, hence the join against a
    # created DataFrame, and fires under the default
    # spark.sql.optimizer.dynamicPartitionPruning.enabled.)
    d = str(tmp_path / "dpp_orders")
    orders = read_table(spark, SF_DIR, "orders")
    (
        orders.withColumn("omonth", F.date_format("o_orderdate", "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy("omonth")
        .parquet(d)
    )
    fact = spark.read.parquet(d)
    dim = spark.createDataFrame(
        [("1995-03", 1), ("1995-04", 1)], "omonth string, flag int"
    )
    j = (
        fact.join(dim.where(F.col("flag") == 1), "omonth")
        .groupBy("omonth")
        .count()
    )
    plan = _explain(j)
    assert "dynamicpruning" in plan
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("dynamicpruning" in ln for ln in pf)
