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
