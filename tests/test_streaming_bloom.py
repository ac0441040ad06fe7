"""streaming/events.py::streaming_bloom_decontaminate — the stream-
static decontamination twin of bloom_contamination_probe: streaming
output must equal the batch query row-for-row, survive a mid-stream
crash with exactly-once landing, and handle the empty-benchmark edge
(every doc flows through with n_hits = 0, matching the batch fix)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import REGISTRY
from tvbigdataproject_spark.sources import read_table
from tvbigdataproject_spark.streaming.events import (
    read_table_stream,
    run_to_memory_sink,
    streaming_bloom_decontaminate,
)
from tvbigdataproject_spark.streaming.sinks import write_batch_idempotent

SF_DIR = "/root/testdata/sf0.001"


def _batch_rows(spark):
    return {
        (r.doc_id, r.n_shingles, r.n_hits)
        for r in REGISTRY["bloom_contamination_probe"].fn(spark, SF_DIR).collect()
    }


def test_streaming_matches_batch_probe(spark, tmp_path):
    docs = read_table(spark, SF_DIR, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    stream = read_table_stream(
        spark, f"{SF_DIR}/documents.parquet", "documents"
    )
    run_to_memory_sink(
        streaming_bloom_decontaminate(stream, bench), "t_bloom_stream"
    )
    got = {
        (r.doc_id, r.n_shingles, r.n_hits)
        for r in spark.sql("SELECT * FROM t_bloom_stream").collect()
    }
    assert got == _batch_rows(spark)


def test_streaming_empty_benchmark_probes_all_zero(spark):
    docs = read_table(spark, SF_DIR, "documents")
    bench = docs.where(F.lit(False))  # empty benchmark corpus
    stream = read_table_stream(
        spark, f"{SF_DIR}/documents.parquet", "documents"
    )
    run_to_memory_sink(
        streaming_bloom_decontaminate(stream, bench), "t_bloom_empty"
    )
    rows = spark.sql("SELECT * FROM t_bloom_empty").collect()
    assert len(rows) == docs.count()  # no doc dropped by the join
    assert all(r.n_hits == 0 for r in rows)


def test_batch_probe_empty_benchmark_keeps_all_docs(spark, tmp_path):
    # the registered BATCH query on a corpus where NO doc_id % 97 == 0:
    # the unconditional-filter-row fix must keep every doc (previously
    # the empty build emptied the cross join while the oracle kept all)
    sf = str(tmp_path / "sf_nobench")
    docs = read_table(spark, SF_DIR, "documents").where(
        F.col("doc_id") % 97 != 0
    )
    n = docs.count()
    docs.write.parquet(f"{sf}/documents.parquet")
    rows = REGISTRY["bloom_contamination_probe"].fn(spark, sf).collect()
    assert len(rows) == n
    assert all(r.n_hits == 0 for r in rows)


def test_streaming_bloom_survives_crash_and_restart(spark, tmp_path):
    """Reuse of the kill-restart harness (test_streaming_sinks): the
    stream crashes after a batch's probe rows land but before the
    checkpoint commit; the restart replays that batch idempotently and
    the drained sink equals the batch recompute exactly."""
    docs = read_table(spark, SF_DIR, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    # multi-file copy so maxFilesPerTrigger=1 yields several batches
    src = str(tmp_path / "docs_multi")
    docs.repartition(4).write.parquet(src)
    out = str(tmp_path / "probe_sink")
    ckpt = str(tmp_path / "ckpt")

    def clean(batch_df, batch_id):
        write_batch_idempotent(batch_df, batch_id, out)

    def crashing(batch_df, batch_id):
        clean(batch_df, batch_id)
        if batch_id == 1:
            raise RuntimeError("injected crash after sink write")

    def start(handler):
        stream = read_table_stream(
            spark, src + "/*.parquet", "documents", max_files_per_trigger=1
        )
        return (
            streaming_bloom_decontaminate(stream, bench)
            .writeStream.foreachBatch(handler)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start(crashing)
    try:
        q.awaitTermination(180)
    except Exception:
        pass  # the injected crash surfaces here
    assert q.exception() is not None  # it really did die mid-stream

    q2 = start(clean)
    q2.awaitTermination(180)
    assert q2.exception() is None

    got = {
        (r.doc_id, r.n_shingles, r.n_hits)
        for r in spark.read.parquet(out).collect()
    }
    assert got == _batch_rows(spark)
    assert spark.read.parquet(out).count() == docs.count()  # exactly once
