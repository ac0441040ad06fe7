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


def test_streaming_join_view_matches_batch_ivm(spark, tmp_path):
    from tvbigdataproject_spark.queries.analytic5 import incremental_join_view
    from tvbigdataproject_spark.sources import read_table
    from tvbigdataproject_spark.streaming.events import read_table_stream
    from tvbigdataproject_spark.streaming.sinks import (
        read_join_view,
        start_join_view_maintenance,
    )

    sf = "/root/testdata/sf0.001"
    stream = read_table_stream(spark, f"{sf}/orders.parquet", "orders")
    customers = read_table(spark, sf, "customer")
    state = str(tmp_path / "view_state")
    q = start_join_view_maintenance(
        stream, customers, state, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = {
        r.segment: (r.n_orders, r.total_price)
        for r in read_join_view(spark, state).collect()
    }
    want = {
        r.segment: (r.n_orders, r.total_price)
        for r in incremental_join_view(spark, sf).collect()
    }
    assert got == want


def test_streaming_join_view_replay_is_idempotent(spark, tmp_path):
    from tvbigdataproject_spark.sources import read_table
    from tvbigdataproject_spark.streaming.sinks import read_join_view

    # simulate a replayed micro-batch: write the same batch partials
    # twice with the same batch_id — the fold must count them once
    from tvbigdataproject_spark.streaming.sinks import write_batch_idempotent

    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    orders = read_table(spark, sf, "orders")
    cust = read_table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    partial = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
        )
    )
    state = str(tmp_path / "state")
    write_batch_idempotent(partial, 0, state)
    write_batch_idempotent(partial, 0, state)  # the replay
    view = {r.segment: r.n_orders for r in read_join_view(spark, state).collect()}
    direct = {
        r.c_mktsegment: r.n
        for r in partial.withColumnRenamed("segment", "c_mktsegment").collect()
    }
    assert view == direct


def test_streaming_join_view_survives_crash_and_restart(spark, tmp_path):
    """Kill-and-restart proof of the exactly-once fold: the stream
    CRASHES after a batch's partials are written but before its
    checkpoint commit (the at-least-once window), restarts from the
    same checkpoint, replays that batch — and the folded view still
    equals the batch recompute, because the replay REPLACES the
    batch's partition instead of appending."""
    from tvbigdataproject_spark.queries.analytic5 import incremental_join_view
    from tvbigdataproject_spark.sources import read_table
    from tvbigdataproject_spark.streaming.events import read_table_stream
    from tvbigdataproject_spark.streaming.sinks import (
        join_view_batch_handler,
        read_join_view,
    )

    sf = "/root/testdata/sf0.001"
    # multi-file copy of orders so maxFilesPerTrigger=1 yields several
    # micro-batches (the shipped table may be a single file)
    src = str(tmp_path / "orders_multi")
    read_table(spark, sf, "orders").repartition(6).write.parquet(src)
    customers = read_table(spark, sf, "customer")
    state = str(tmp_path / "view_state")
    ckpt = str(tmp_path / "ckpt")
    inner = join_view_batch_handler(customers, state)

    def crashing(batch_df, batch_id):
        inner(batch_df, batch_id)  # partials land first...
        if batch_id == 2:
            # ...then the process "dies" before the commit
            raise RuntimeError("injected crash after sink write")

    stream = read_table_stream(
        spark, src + "/*.parquet", "orders", max_files_per_trigger=1
    )
    q = (
        stream.writeStream.foreachBatch(crashing)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    except Exception:
        pass  # the injected crash surfaces here
    assert q.exception() is not None  # it really did die mid-stream

    # restart from the SAME checkpoint with the clean handler: batch 2
    # is replayed (its partials partition already exists) and the rest
    # of the files drain
    stream2 = read_table_stream(
        spark, src + "/*.parquet", "orders", max_files_per_trigger=1
    )
    q2 = (
        stream2.writeStream.foreachBatch(inner)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    assert q2.exception() is None

    got = {
        r.segment: (r.n_orders, r.total_price)
        for r in read_join_view(spark, state).collect()
    }
    want = {
        r.segment: (r.n_orders, r.total_price)
        for r in incremental_join_view(spark, sf).collect()
    }
    assert got == want
