"""Bucketed tables co-locate joins: same key, same bucket count ->
SortMergeJoin with NO Exchange on either side (sources/io.py
write_bucketed). The assertion is on the physical plan — the whole
point of bucketing is the shuffle that ISN'T there."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tvbigdataproject_spark.sources.io import (
    read_bucketed,
    read_table,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders, "t_orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"]
    )
    write_bucketed(
        li, "t_lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    yield orders, li
    for t in ("t_orders_b", "t_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    a = read_bucketed(spark, "t_orders_b")
    b = read_bucketed(spark, "t_lineitem_b")
    # at this fixture SF the optimizer would broadcast (also
    # shuffle-free but proves nothing about bucketing); the merge hint
    # forces the SMJ path whose Exchanges bucketing must elide
    joined = a.hint("merge").join(b, a.o_orderkey == b.l_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan[:2000]


def test_bucketed_join_values_match_plain_join(spark, bucketed):
    orders, li = bucketed
    a = read_bucketed(spark, "t_orders_b")
    b = read_bucketed(spark, "t_lineitem_b")
    got = (
        a.join(b, a.o_orderkey == b.l_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .alias("s"),
        )
        .collect()[0]
    )
    want = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .alias("s"),
        )
        .collect()[0]
    )
    assert (got.n, got.s) == (want.n, want.s)
    assert got.n > 0


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    # aggregation on the bucket key also reuses the clustering
    b = read_bucketed(spark, "t_lineitem_b")
    agg = b.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
