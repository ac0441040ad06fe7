"""Custom Python DataSource WRITER (sources/pydatasink.py): the
two-phase commit contract, observed from the filesystem."""

from __future__ import annotations

import glob
import json

import pytest

from tvbigdataproject_spark.sources.pydatasink import register_json_sink


def test_jsonldir_commit_is_atomic_and_complete(spark, tmp_path):
    register_json_sink(spark)
    d = str(tmp_path / "out")
    df = spark.range(0, 100, 1, 4).selectExpr(
        "id", "id % 7 AS grp", "CAST(id AS STRING) AS s"
    )
    df.write.format("jsonldir").option("path", d).mode("append").save()
    parts = sorted(glob.glob(d + "/part-*.jsonl"))
    assert len(parts) == 4
    manifest = json.load(open(d + "/_SUCCESS"))
    assert manifest == {"rows": 100, "parts": 4}
    rows = [json.loads(line) for p in parts for line in open(p)]
    assert {r["id"] for r in rows} == set(range(100))
    assert glob.glob(d + "/_tmp*") == []


def test_jsonldir_failed_write_leaves_no_partial_output(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    register_json_sink(spark)
    d = str(tmp_path / "out_fail")

    @F.udf(LongType())
    def boom(v):
        if v >= 50:
            raise RuntimeError("injected failure")
        return v

    df = spark.range(0, 100, 1, 4).select(boom("id").alias("id"))
    with pytest.raises(Exception):
        df.write.format("jsonldir").option("path", d).mode("append").save()
    # no committed parts, no manifest, no leaked temps — a
    # manifest-requiring reader observes "nothing was written"
    assert glob.glob(d + "/part-*.jsonl") == []
    assert glob.glob(d + "/_SUCCESS") == []
    assert glob.glob(d + "/_tmp*") == []


def test_jsonldir_overwrite_removes_stale_parts(spark, tmp_path):
    register_json_sink(spark)
    d = str(tmp_path / "out_ow")
    big = spark.range(0, 80, 1, 8).selectExpr("id")
    big.write.format("jsonldir").option("path", d).mode("append").save()
    assert len(glob.glob(d + "/part-*.jsonl")) == 8
    small = spark.range(0, 10, 1, 2).selectExpr("id")
    small.write.format("jsonldir").option("path", d).mode("overwrite").save()
    # no stale part files from the larger previous job survive
    parts = sorted(glob.glob(d + "/part-*.jsonl"))
    assert len(parts) == 2
    manifest = json.load(open(d + "/_SUCCESS"))
    assert manifest == {"rows": 10, "parts": 2}
    rows = [json.loads(line) for p in parts for line in open(p)]
    assert {r["id"] for r in rows} == set(range(10))


def test_jsonldir_append_never_clobbers_prior_parts(spark, tmp_path):
    register_json_sink(spark)
    d = str(tmp_path / "out_app")
    spark.range(0, 10, 1, 2).write.format("jsonldir").option("path", d).mode(
        "append"
    ).save()
    spark.range(10, 20, 1, 2).write.format("jsonldir").option("path", d).mode(
        "append"
    ).save()
    parts = sorted(glob.glob(d + "/part-*.jsonl"))
    assert len(parts) == 4
    manifest = json.load(open(d + "/_SUCCESS"))
    assert manifest == {"rows": 20, "parts": 4}
    rows = [json.loads(line) for p in parts for line in open(p)]
    assert {r["id"] for r in rows} == set(range(20))
