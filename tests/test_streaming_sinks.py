"""Exactly-once foreachBatch parquet sink: batch replay must not
duplicate rows, and a drained stream must land every input row once."""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.sources import read_table
from tvbigdataproject_spark.streaming import read_event_stream
from tvbigdataproject_spark.streaming.sinks import (
    start_idempotent_parquet_sink,
    write_batch_idempotent,
)

SF_DIR = "/root/testdata/sf0.001"


def test_batch_replay_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "sink")
    df = read_table(spark, SF_DIR, "events").limit(100)
    # at-least-once delivery: the same (batch_id, data) arrives twice
    # after a crash between sink write and checkpoint commit
    write_batch_idempotent(df, 7, out)
    write_batch_idempotent(df, 7, out)
    assert spark.read.parquet(out).count() == 100
    # a different batch id appends rather than replacing
    write_batch_idempotent(df, 8, out)
    assert spark.read.parquet(out).count() == 200


def test_drained_stream_lands_every_row_once(spark, tmp_path):
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = read_event_stream(
        spark, f"{SF_DIR}/events.parquet", max_files_per_trigger=1
    )
    q = start_idempotent_parquet_sink(stream, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    want = read_table(spark, SF_DIR, "events")
    assert got.count() == want.count()
    # restart on the same checkpoint: no new data → no new rows
    q2 = start_idempotent_parquet_sink(
        read_event_stream(spark, f"{SF_DIR}/events.parquet"), out, ckpt
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == want.count()
    # value-level: per-type counts survive the trip
    got_counts = {
        r["event_type"]: r["n"]
        for r in got.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want_counts = {
        r["event_type"]: r["n"]
        for r in want.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got_counts == want_counts
