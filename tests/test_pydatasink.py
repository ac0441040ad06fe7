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


def test_jsonldir_overwrite_deletes_manifest_before_parts(tmp_path, monkeypatch):
    # ordering contract of the overwrite window: the stale _SUCCESS
    # must be the FIRST thing removed, so a crash mid-overwrite leaves
    # a manifest-less (visibly in-flight) directory, never an old
    # manifest pointing at half-deleted parts. Observed by recording
    # the driver-side os.remove sequence on a direct commit() call.
    import os as _os

    from tvbigdataproject_spark.sources.pydatasink import (
        JsonDirWriter,
        _PartMessage,
    )

    d = tmp_path / "out_order"
    d.mkdir()
    (d / "part-00000.jsonl").write_text('{"id": 1}\n')
    (d / "part-00001.jsonl").write_text('{"id": 2}\n')
    (d / "_SUCCESS").write_text('{"rows": 2, "parts": 2}')
    tmp = d / "_tmp-job-xyz.jsonl"
    tmp.write_text('{"id": 9}\n')

    removed = []
    real_remove = _os.remove
    monkeypatch.setattr(
        "tvbigdataproject_spark.sources.pydatasink.os.remove",
        lambda p: (removed.append(_os.path.basename(p)), real_remove(p)),
    )
    w = JsonDirWriter(path=str(d), columns=["id"], overwrite=True)
    w.commit([_PartMessage(tmp_path=str(tmp), n_rows=1)])
    assert removed[0] == "_SUCCESS"
    assert set(removed[1:]) == {"part-00000.jsonl", "part-00001.jsonl"}
    # and the final state is the fresh job's output
    assert json.load(open(d / "_SUCCESS")) == {"rows": 1, "parts": 1}
    assert glob.glob(str(d / "part-*.jsonl")) == [str(d / "part-00000.jsonl")]


def test_jsonldir_append_parses_wide_and_foreign_part_names(tmp_path):
    # regex part-number parsing: six-digit part numbers (a directory
    # that grew past 99999 parts) must not be slice-truncated back
    # into the occupied range, and non-numeric lookalikes are ignored
    from tvbigdataproject_spark.sources.pydatasink import (
        JsonDirWriter,
        _PartMessage,
    )

    d = tmp_path / "out_wide"
    d.mkdir()
    (d / "part-00003.jsonl").write_text('{"id": 1}\n')
    (d / "part-123456.jsonl").write_text('{"id": 2}\n')  # 6 digits
    # matches the part-*.jsonl glob but not the \d+ regex: ignored
    (d / "part-abc.jsonl").write_text("junk\n")
    (d / "_SUCCESS").write_text('{"rows": 2, "parts": 2}')
    tmp = d / "_tmp-job-abc.jsonl"
    tmp.write_text('{"id": 9}\n')
    w = JsonDirWriter(path=str(d), columns=["id"], overwrite=False)
    w.commit([_PartMessage(tmp_path=str(tmp), n_rows=1)])
    # numbering continues past the WIDE max, clobbering nothing
    assert (d / "part-123457.jsonl").exists()
    assert (d / "part-00003.jsonl").exists()
    assert (d / "part-123456.jsonl").exists()
    assert json.load(open(d / "_SUCCESS"))["rows"] == 3


def test_orc_roundtrip_partitioned(spark, tmp_path):
    from pyspark.sql import functions as F

    from tvbigdataproject_spark.sources import read_table
    from tvbigdataproject_spark.sources.io import read_orc, write_orc

    src = read_table(spark, "/root/testdata/sf0.001", "region")
    out = str(tmp_path / "region_orc")
    write_orc(src, out)
    back = read_orc(spark, out)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in src.collect()
    }
    # partitioned layout: one directory per key value
    nat = read_table(spark, "/root/testdata/sf0.001", "nation")
    out2 = str(tmp_path / "nation_orc")
    write_orc(nat, out2, partition_by=["n_regionkey"])
    import os

    parts = [d for d in os.listdir(out2) if d.startswith("n_regionkey=")]
    assert len(parts) == nat.select("n_regionkey").distinct().count()
    back2 = read_orc(spark, out2)
    assert back2.count() == nat.count()
    # partition-pruning: a key filter reads a single directory
    pruned = back2.where(F.col("n_regionkey") == 0)
    assert "n_regionkey" in pruned.inputFiles()[0]
