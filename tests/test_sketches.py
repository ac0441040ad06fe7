"""HLL sketch query: estimates are engine-specific (no DuckDB oracle),
so pin the behavior here — bounded relative error vs the exact counts
the query carries, and merge consistency (union of per-type sketches
must estimate the global cardinality, not the sum of per-type ones)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries import REGISTRY
from tvbigdataproject_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.01"


def test_hll_estimates_within_tolerance(spark):
    rows = {
        r["event_type"]: r
        for r in REGISTRY["sketch_distinct_users"].fn(spark, SF_DIR).collect()
    }
    assert "ALL" in rows
    for etype, r in rows.items():
        if etype == "ALL":
            continue
        exact = r["exact_users"]
        assert exact > 0
        assert abs(r["approx_users"] - exact) / exact <= 0.05, (etype, r)


def test_hll_merge_estimates_global_distinct(spark):
    rows = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["sketch_distinct_users"].fn(spark, SF_DIR).collect()
    }
    exact_global = (
        read_table(spark, SF_DIR, "events")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()[0]["n"]
    )
    # merged sketch ≈ distinct-of-union (users overlap across types, so
    # the per-type sum would be far larger — merge must NOT be a sum)
    assert abs(rows["ALL"] - exact_global) / exact_global <= 0.05
    assert rows["ALL"] < sum(v for k, v in rows.items() if k != "ALL")


def test_approx_quantiles_bracketed_by_exact(spark):
    approx = {
        r["event_type"]: r
        for r in REGISTRY["approx_quantiles_value"].fn(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r
        for r in (
            read_table(spark, SF_DIR, "events")
            .groupBy("event_type")
            .agg(
                F.expr("percentile(value, array(0.45, 0.55))").alias("b50"),
                F.expr("percentile(value, array(0.90, 0.99))").alias("b95"),
                F.expr("percentile(value, array(0.95, 1.00))").alias("b99"),
            )
            .collect()
        )
    }
    assert set(approx) == set(exact)
    for etype, a in approx.items():
        e = exact[etype]
        assert e["b50"][0] <= a["p50"] <= e["b50"][1], (etype, "p50")
        assert e["b95"][0] <= a["p95"] <= e["b95"][1], (etype, "p95")
        assert e["b99"][0] <= a["p99"] <= e["b99"][1], (etype, "p99")
