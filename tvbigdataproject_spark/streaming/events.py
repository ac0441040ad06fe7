"""Structured Streaming surface over event tables.

The reference is pure batch (SURVEY.md §2.10) — this is the additive
streaming surface. The aggregation bodies are the same expressions as
the batch queries (queries/temporal.py), so pipelines move between batch
and streaming without rewriting: tumbling/sliding via F.window, sessions
via F.session_window, late data bounded by withWatermark, and streaming
dedup via dropDuplicatesWithinWatermark — all built-in operators, no
custom state store.

Scale notes: watermark delay bounds state size (the only unbounded risk
in streaming aggs); file sources at 100 TB become Kafka sources with the
same plan bodies; `maxFilesPerTrigger` is the local backpressure knob.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tvbigdataproject_spark.schemas import TESTDATA_SCHEMAS


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based event stream with the explicit schema (streaming reads
    never infer). ``ts`` arrives as a raw long in the file's native unit
    (nanos or micros across testdata generations — see sources/io.py)
    and is converted to wall-clock micros here too."""
    from tvbigdataproject_spark.sources.io import _ts_unit

    ts_unit = _ts_unit(path)
    reader = spark.readStream.schema(TESTDATA_SCHEMAS["events"])
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        # the file stream source monitors directories; point it at the
        # parent and glob just this file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    df = reader.parquet(path)
    # Watermarks only accept TIMESTAMP (LTZ) event time — with the session
    # pinned to UTC this carries the same wall-clock instants as the batch
    # reader's TIMESTAMP_NTZ; window bounds are cast back to NTZ after
    # aggregation so streaming output lines up with the batch twins.
    micros = F.expr("ts div 1000") if ts_unit == "ns" else F.col("ts")
    return df.withColumn("ts", F.timestamp_micros(micros))


def streaming_tumbling_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event type — same body
    as queries/temporal.py::tumbling_window_agg."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_session_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked session windows per user — same body as
    queries/temporal.py::sessionize_events."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").cast("timestamp_ntz").alias("session_start"),
            "n_events",
        )
    )


def streaming_ohlc_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked hourly OHLC bars per event type — the streaming twin
    of queries/temporal2.py::ohlc_bars_hourly. The batch query picks
    open/close with an ordered window (row_number); streaming
    aggregations cannot sort, so open/close come from min_by/max_by
    keyed on the (ts, event_id) struct — lexicographic struct ordering
    makes the pick identical to the batch tie-break, which the
    batch-equivalence test asserts. min_by/max_by carry one (key,
    value) pair of state per group and merge associatively, so the agg
    stays incremental across micro-batches.
    """
    pick = F.struct("ts", "event_id")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.min_by("value", pick).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", pick).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("bucket"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    dropDuplicatesWithinWatermark keeps a key only until the watermark
    passes it, so state is O(keys per watermark window), not O(stream)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def streaming_view_click_join(
    events: DataFrame, within: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: each view joined to the same user's
    clicks within ``within`` after it (the attribution shape). Both
    sides carry watermarks and the join condition bounds both event
    times, so Spark can expire join state — without the time bound a
    stream-stream join buffers forever. Same body as the batch twin
    (queries/temporal.py::interval_join_view_click)."""
    views = (
        events.where(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user_id"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    joined = views.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {within}")),
    )
    return joined.select(
        "user_id",
        F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
    )


def streaming_enrich_with_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a (batch)
    dimension table — the lookup/enrichment shape every streaming
    pipeline has. No watermark is needed and no join state accumulates:
    the static side is planned fresh per micro-batch (so a dim refresh
    is picked up on the next batch), and with AQE the small dim
    broadcasts — each micro-batch is a map-side hash join, the same
    physical shape as the batch twin. At 100 TB-of-stream the dim side
    stays bounded; if the dim itself is huge, pre-bucket it on the join
    key so per-batch joins co-locate."""
    return events.join(dim, "user_id", "left").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.col("segment"),
    )


def streaming_bloom_decontaminate(
    doc_stream: DataFrame, bench_docs: DataFrame, n: int = 3
) -> DataFrame:
    """Streaming decontamination twin of
    queries/llm_ops8.py::bloom_contamination_probe: build ONE Bloom
    filter from the static benchmark corpus's word n-gram shingles and
    probe every streaming document against it, emitting
    (doc_id, n_shingles, n_hits) — held-out docs hit ~all shingles,
    clean docs only the fp tail.

    Stream-static shape: the filter side is a one-row static aggregate
    (constant m/64 longs regardless of benchmark size — the point of
    the sketch), attached via a constant-key equi-join so Catalyst
    plans a per-micro-batch broadcast hash join (streaming joins don't
    take the batch twin's crossJoin; the lit-key rewrite is the
    supported stream-static form and the same physical attach). No join
    state accumulates — the static side is re-planned per micro-batch,
    so a benchmark refresh is picked up on the next batch. The probe
    itself is scan-local per document. The empty-benchmark edge matches
    the batch twin: a global aggregate always yields exactly one row,
    coalesced to the all-zero filter, so every doc still flows through
    with n_hits = 0.
    """
    from tvbigdataproject_spark.functions.text import shingles
    from tvbigdataproject_spark.operators.bloom import (
        M_BITS,
        bloom_build,
        bloom_might_contain,
    )

    bench = bench_docs.select(
        F.lit(1).alias("grp"),
        F.explode(shingles(F.col("text"), n=n, distinct=True)).alias("s"),
    )
    filt = (
        bloom_build(bench, group_col="grp", key_col="s")
        .agg(F.first("filter").alias("f0"))
        .select(
            F.lit(1).alias("j"),
            F.coalesce(
                F.col("f0"),
                F.array_repeat(F.lit(0).cast("long"), M_BITS // 64),
            ).alias("filter"),
        )
    )
    probe = doc_stream.select(
        "doc_id",
        shingles(F.col("text"), n=n, distinct=True).alias("shs"),
        F.lit(1).alias("j"),
    )
    joined = probe.join(F.broadcast(filt), "j")
    n_hits = F.size(
        F.filter(F.col("shs"), lambda s: bloom_might_contain(F.col("filter"), s))
    )
    return joined.select(
        "doc_id", F.size("shs").alias("n_shingles"), n_hits.alias("n_hits")
    )


def run_to_memory_sink(
    stream_df: DataFrame, name: str, output_mode: str = "append", timeout_sec: int = 240
):
    """Drain a bounded stream (availableNow) into an in-memory table and
    return the completed query. Test/dev helper — production sinks are
    parquet/Kafka writers with checkpointing.

    For windowed aggregations pass output_mode="complete": under
    availableNow the watermark never passes the final windows, so append
    mode would hold back the tail forever.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination(timeout) returns False on timeout WITHOUT raising;
    # a caller that proceeds would assert against a partially-drained
    # table and fail with a baffling value diff (observed as a full-suite
    # flake on a loaded host, 2026-08-15). Fail loudly instead.
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"memory-sink drain '{name}' incomplete after {timeout_sec}s"
        )
    return q


def read_table_stream(
    spark: SparkSession,
    path: str,
    table: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based stream over any testdata table with its explicit
    schema (streaming reads never infer). Unlike events, the TPC-H-ish
    tables carry timestamp_ntz columns that parquet streams read
    as-is — no unit conversion needed."""
    reader = spark.readStream.schema(TESTDATA_SCHEMAS[table])
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)


def streaming_value_bins(
    events: DataFrame,
    edges: list[float],
    window: str = "6 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked per-window value-distribution bin counts — the
    streaming half of a drift monitor (the batch half is
    queries/analytic10.py::tvd_value_drift). Bin edges are FIXED
    literals from a batch baseline: a stream cannot see global
    min/max, and production drift monitors bin against the reference
    distribution anyway (moving edges would hide the drift being
    measured). The bin expression is a pure literal CASE ladder, so
    the aggregate is an ordinary incremental windowed count — bounded
    state (windows x bins), append-safe past the watermark; the
    per-window TVD against reference shares is a bounded post-join on
    the sink side.
    """
    b = F.lit(0)
    for e in edges:
        b = b + F.when(F.col("value") >= F.lit(float(e)), 1).otherwise(0)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("window_start"),
            "bin",
            "n",
        )
    )
