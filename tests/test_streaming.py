"""Structured Streaming tests: bounded availableNow runs over the events
parquet, checked against the batch twins (same window semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tvbigdataproject_spark.queries import REGISTRY
from tvbigdataproject_spark.sources import read_table
from tvbigdataproject_spark.streaming import (
    read_event_stream,
    run_to_memory_sink,
    streaming_dedup,
    streaming_session_agg,
    streaming_tumbling_agg,
)
from tvbigdataproject_spark.streaming.events import streaming_view_click_join

SF_DIR = "/root/testdata/sf0.001"
EVENTS = f"{SF_DIR}/events.parquet"


@pytest.fixture(scope="module")
def stream(spark):
    return read_event_stream(spark, EVENTS)


def _table(spark, name):
    return {tuple(r) for r in spark.table(name).collect()}


def test_streaming_tumbling_matches_batch(spark, stream):
    run_to_memory_sink(
        streaming_tumbling_agg(stream), "t_tumble", output_mode="complete"
    )
    got = _table(spark, "t_tumble")
    batch = (
        read_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    want = {tuple(r) for r in batch.collect()}
    assert got == want


def test_streaming_sessions_match_batch(spark, stream):
    run_to_memory_sink(
        streaming_session_agg(stream), "t_sess", output_mode="complete"
    )
    got = _table(spark, "t_sess")
    batch = (
        read_table(spark, SF_DIR, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("win.start").alias("session_start"), "n_events")
    )
    assert got == {tuple(r) for r in batch.collect()}


def test_streaming_dedup_bounded_state(spark, stream):
    # event_id is unique in the fixture → dedup is a pass-through; the
    # point is the operator runs with watermarked (bounded) state.
    run_to_memory_sink(
        streaming_dedup(stream, keys=["event_id"]), "t_dedup", output_mode="append"
    )
    n = spark.table("t_dedup").count()
    assert n == read_table(spark, SF_DIR, "events").count()


def test_streaming_batch_twin_is_oracle_checked(spark):
    # the batch twins of these streaming ops are part of the oracle suite
    for name in ("tumbling_window_agg", "sliding_window_agg", "sessionize_events"):
        assert REGISTRY[name].sql is not None


def test_streaming_interval_join_matches_batch(spark, stream):
    # stream-stream interval join (view -> click attribution) must
    # produce exactly the batch twin's rows; append mode — joins emit
    # matches as watermarks allow, availableNow drains them all
    run_to_memory_sink(
        streaming_view_click_join(stream), "t_vcj", output_mode="append"
    )
    got = _table(spark, "t_vcj")
    want = {
        tuple(r)
        for r in REGISTRY["interval_join_view_click"].fn(spark, SF_DIR).collect()
    }
    assert got == want


def test_stream_static_enrichment_matches_batch(spark):
    from tvbigdataproject_spark.streaming.events import streaming_enrich_with_dim

    # a derived user dimension (bucketed segment per user) as the static side
    dim = (
        read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.when(F.col("n") >= 10, "heavy").otherwise("light").alias("segment"),
        )
    )
    stream = read_event_stream(spark, EVENTS, max_files_per_trigger=1)
    run_to_memory_sink(
        streaming_enrich_with_dim(stream, dim), "t_enriched", output_mode="append"
    )
    got = _table(spark, "t_enriched")
    want = {
        tuple(r)
        for r in read_table(spark, SF_DIR, "events")
        .join(dim, "user_id", "left")
        .select("event_id", "user_id", "event_type", "value", "segment")
        .collect()
    }
    assert got == want


def test_streaming_ohlc_matches_batch_query(spark, stream):
    # the registered batch query picks open/close via an ordered window;
    # the streaming twin uses min_by/max_by on the (ts, event_id) struct
    # — same tie-break, so the results must be row-identical
    from tvbigdataproject_spark.streaming import streaming_ohlc_agg

    run_to_memory_sink(
        streaming_ohlc_agg(stream), "t_ohlc", output_mode="complete"
    )
    cols = ["event_type", "bucket", "open", "high", "low", "close", "n_events"]
    got = {tuple(r) for r in spark.table("t_ohlc").select(*cols).collect()}
    batch = REGISTRY["ohlc_bars_hourly"].fn(spark, SF_DIR).select(*cols)
    want = {tuple(r) for r in batch.collect()}
    assert got == want


def test_streaming_value_bins_match_batch(spark, stream):
    from tvbigdataproject_spark.streaming import streaming_value_bins

    # reference edges from the batch baseline (quartiles) — the
    # production shape: bins are fixed by the reference distribution,
    # the stream only counts into them
    batch_ev = read_table(spark, SF_DIR, "events")
    edges = list(batch_ev.selectExpr(
        "percentile(value, 0.25) AS a",
        "percentile(value, 0.5) AS b",
        "percentile(value, 0.75) AS c",
    ).collect()[0])
    run_to_memory_sink(
        streaming_value_bins(stream, edges), "t_bins", output_mode="complete"
    )
    got = _table(spark, "t_bins")
    b = F.lit(0)
    for e in edges:
        b = b + F.when(F.col("value") >= F.lit(float(e)), 1).otherwise(0)
    batch = (
        batch_ev.groupBy(F.window("ts", "6 hours").alias("win"), b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), "bin", "n")
    )
    assert got == {tuple(r) for r in batch.collect()}
    # every window splits the full value range into 4 reference bins
    bins = {r[1] for r in got}
    assert bins == {0, 1, 2, 3}
