"""applyInPandasWithState: custom per-key accumulator across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.sources import read_table
from tvbigdataproject_spark.streaming import read_event_stream, run_to_memory_sink
from tvbigdataproject_spark.streaming.stateful import streaming_user_totals

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_running_totals_match_batch(spark):
    stream = read_event_stream(
        spark, f"{SF_DIR}/events.parquet", max_files_per_trigger=1
    )
    run_to_memory_sink(
        streaming_user_totals(stream), "t_totals", output_mode="update"
    )
    # update mode re-emits a key's totals each batch it appears in — the
    # final (max-n) emission per key is the complete total
    emitted = (
        spark.table("t_totals")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
    )
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in emitted.collect()}
    batch = (
        read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
    )
    want = {r["user_id"]: (r["n"], round(r["t"], 6)) for r in batch.collect()}
    assert set(got) == set(want)
    for uid, (n, _) in want.items():
        assert got[uid][0] == n
        # float sum order differs (pandas per-batch vs spark partials)
        assert abs(got[uid][1] - want[uid][1]) < 1e-6


def test_streaming_funnel_matches_batch_semantics(spark):
    from pyspark.sql import functions as F

    from tvbigdataproject_spark.sources import read_table
    from tvbigdataproject_spark.streaming import read_event_stream, run_to_memory_sink
    from tvbigdataproject_spark.streaming.stateful import streaming_funnel_stage

    stream = read_event_stream(
        spark, f"{SF_DIR}/events.parquet", max_files_per_trigger=1
    )
    run_to_memory_sink(
        streaming_funnel_stage(stream), "t_funnel", output_mode="update"
    )
    # an update-mode memory sink holds one row per micro-batch per
    # updated user, and collect() order across batches is not
    # contractual — take max(stage) per user (valid because stage is
    # monotone nondecreasing) instead of relying on last-row-wins
    got: dict = {}
    for r in spark.table("t_funnel").collect():
        got[r.user_id] = max(got.get(r.user_id, 0), r.stage)

    steps = (
        read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("tv"),
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("tc"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
        )
    )
    want = {}
    for r in steps.collect():
        stage = 0
        if r.tv is not None:
            stage = 1
            if r.tc is not None and r.tc > r.tv:
                stage = 2
                if r.tp is not None and r.tp > r.tc:
                    stage = 3
        want[r.user_id] = stage
    assert got == want


def test_streaming_clamped_balance_matches_batch_single_batch(spark):
    from pyspark.sql import functions as F

    from tvbigdataproject_spark.queries.analytic5 import clamped_inventory_balance
    from tvbigdataproject_spark.streaming.stateful import streaming_clamped_balance

    stream = read_event_stream(spark, f"{SF_DIR}/events.parquet")
    run_to_memory_sink(
        streaming_clamped_balance(stream), "t_clamp1", output_mode="update"
    )
    got = {
        r.user_id: (r.n_events, r.bal_cents)
        for r in spark.table("t_clamp1").collect()
    }
    batch_last = (
        clamped_inventory_balance(spark, SF_DIR)
        .groupBy("user_id")
        .agg(F.max_by("bal_cents", "rn").alias("bal"), F.max("rn").alias("n"))
    )
    want = {r.user_id: (r.n, r.bal) for r in batch_last.collect()}
    assert got == want


def test_streaming_clamped_balance_carries_state_across_batches(spark, tmp_path):
    # split the event log into 3 time-ordered files; with
    # maxFilesPerTrigger=1 each arrives as its own micro-batch, so the
    # final emission proves the balance state survives batch boundaries
    import os

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from tvbigdataproject_spark.queries.analytic5 import clamped_inventory_balance
    from tvbigdataproject_spark.streaming.stateful import streaming_clamped_balance

    t = pq.read_table(f"{SF_DIR}/events.parquet")
    t = t.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    n = t.num_rows
    d = tmp_path / "events_split"
    d.mkdir()
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        p = d / f"part-{i}.parquet"
        pq.write_table(t.slice(cuts[i], cuts[i + 1] - cuts[i]), p)
        # file stream source orders by modification time: make it match
        # the time split explicitly
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = read_event_stream(spark, str(d), max_files_per_trigger=1)
    run_to_memory_sink(
        streaming_clamped_balance(stream), "t_clamp3", output_mode="update"
    )
    # update mode re-emits per batch; n_events is strictly increasing, so
    # the max-n emission per user is the final state
    emitted = (
        spark.table("t_clamp3")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n"),
            F.max_by("bal_cents", "n_events").alias("bal"),
        )
    )
    got = {r.user_id: (r.n, r.bal) for r in emitted.collect()}
    batch_last = (
        clamped_inventory_balance(spark, SF_DIR)
        .groupBy("user_id")
        .agg(F.max_by("bal_cents", "rn").alias("bal"), F.max("rn").alias("n"))
    )
    want = {r.user_id: (r.n, r.bal) for r in batch_last.collect()}
    assert got == want


def test_streaming_scd2_matches_batch_across_batches(spark, tmp_path):
    # 3 time-ordered micro-batches (the sequential-state contract);
    # the reconstructed dimension must equal the batch SCD2 build
    import os

    import pyarrow.parquet as pq

    from tvbigdataproject_spark.queries.scd import scd2_user_state
    from tvbigdataproject_spark.streaming.stateful import streaming_scd2_state

    t = pq.read_table(f"{SF_DIR}/events.parquet")
    t = t.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    n = t.num_rows
    d = tmp_path / "events_split"
    d.mkdir()
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        p = d / f"part-{i}.parquet"
        pq.write_table(t.slice(cuts[i], cuts[i + 1] - cuts[i]), p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = read_event_stream(spark, str(d), max_files_per_trigger=1)
    run_to_memory_sink(
        streaming_scd2_state(stream), "t_scd2", output_mode="update"
    )
    # per run (user, valid_from): n_events grows monotonically and the
    # closing emission carries the final count, so max-n wins; at a tie
    # (run closed with no further events after its last open re-emit)
    # the closed row — valid_to set — is the verdict
    emitted = spark.table("t_scd2")
    w = F.struct(
        F.col("n_events"),
        F.col("valid_to_us").isNotNull().cast("int"),
        F.col("event_type"),
        F.col("valid_to_us"),
        F.col("is_current"),
    )
    got = {
        (r.user_id, r.vf): r.v
        for r in emitted.groupBy(
            F.col("user_id"), F.col("valid_from_us").alias("vf")
        )
        .agg(F.max(w).alias("v"))
        .collect()
    }
    batch = scd2_user_state(spark, SF_DIR).select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("valid_from").cast("timestamp")).alias("vf"),
        F.unix_micros(F.col("valid_to").cast("timestamp")).alias("vt"),
        "is_current",
        "n_events",
    )
    want = {
        (r.user_id, r.vf): (r.n_events, r.event_type, r.vt, r.is_current)
        for r in batch.collect()
    }
    assert set(got) == set(want)
    for k, v in got.items():
        assert (v.n_events, v.event_type, v.valid_to_us, v.is_current) == want[k], (
            k, v, want[k],
        )


def test_streaming_interval_coalesce_matches_batch_across_batches(
    spark, tmp_path
):
    # same 3-way time-split contract as the SCD2 test: closed spans +
    # the final open-span emission must reconstruct the batch packing
    import os

    import pyarrow.parquet as pq

    from tvbigdataproject_spark.queries.registry import REGISTRY
    from tvbigdataproject_spark.streaming.stateful import (
        streaming_interval_coalesce,
    )

    t = pq.read_table(f"{SF_DIR}/events.parquet")
    t = t.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    n = t.num_rows
    d = tmp_path / "events_split_ivc"
    d.mkdir()
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        p = d / f"part-{i}.parquet"
        pq.write_table(t.slice(cuts[i], cuts[i + 1] - cuts[i]), p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = read_event_stream(spark, str(d), max_files_per_trigger=1)
    run_to_memory_sink(
        streaming_interval_coalesce(stream), "t_ivc", output_mode="update"
    )
    # per (user, grp): the open span is re-emitted as it grows, the
    # closing emission repeats its final extent — max(n, end) is the
    # settled verdict either way
    emitted = spark.table("t_ivc")
    got = {
        (r.user_id, r.grp): (r.v.span_start_us, r.v.span_end_us, r.v.n_intervals)
        for r in emitted.groupBy("user_id", "grp")
        .agg(
            F.max(
                F.struct("n_intervals", "span_end_us", "span_start_us")
            ).alias("v")
        )
        .collect()
    }
    batch = REGISTRY["interval_coalesce_user"].fn(spark, SF_DIR)
    want = {
        (r.user_id, r.grp): (r.span_start_us, r.span_end_us, r.n_intervals)
        for r in batch.collect()
    }
    assert set(got) == set(want)
    for k, v in got.items():
        assert v == want[k], (k, v, want[k])
