"""streaming/sinks.py::incremental_dedup_batch_handler — the
continuous-crawl dedup twin: batch-query equivalence on the seeded
split, growing-store semantics across batches, and replay idempotence
(the exactly-once window, including the self-exclusion rule that keeps
a replayed batch from seeing its own first-attempt fingerprints)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import REGISTRY
from tvbigdataproject_spark.sources import read_table
from tvbigdataproject_spark.streaming.events import read_table_stream
from tvbigdataproject_spark.streaming.sinks import (
    SEED_BATCH_ID,
    incremental_dedup_batch_handler,
    start_incremental_dedup,
    write_batch_idempotent,
)

SF_DIR = "/root/testdata/sf0.001"


def _seed_history(spark, store):
    docs = read_table(spark, SF_DIR, "documents")
    fps = (
        docs.where(F.col("doc_id") % 10 < 8)
        .select(F.md5("text").alias("content_hash"))
        .distinct()
    )
    write_batch_idempotent(fps, SEED_BATCH_ID, store)


def _read_flags(spark, out):
    return {
        (r.doc_id, r.seen_before)
        for r in spark.read.parquet(out).select("doc_id", "seen_before").collect()
    }


def test_streamed_incoming_matches_batch_query(spark, tmp_path):
    store = str(tmp_path / "store")
    out = str(tmp_path / "flags")
    ckpt = str(tmp_path / "ckpt")
    _seed_history(spark, store)
    # single-file incoming split -> one micro-batch, so the growing
    # store can't diverge from the batch query's fixed-history semantics
    inc_src = str(tmp_path / "incoming")
    read_table(spark, SF_DIR, "documents").where(
        F.col("doc_id") % 10 >= 8
    ).coalesce(1).write.parquet(inc_src)
    stream = read_table_stream(spark, inc_src + "/*.parquet", "documents")
    q = start_incremental_dedup(stream, store, out, ckpt)
    q.awaitTermination(180)
    assert q.exception() is None
    want = {
        (r.doc_id, r.seen_before)
        for r in REGISTRY["dedup_incremental"].fn(spark, SF_DIR).collect()
    }
    assert _read_flags(spark, out) == want


def test_store_grows_across_batches(spark, tmp_path):
    store = str(tmp_path / "store")
    out = str(tmp_path / "flags")
    handle = incremental_dedup_batch_handler(store, out)
    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    # doc 3 duplicates doc 1's content; doc 4 is novel
    b2 = spark.createDataFrame(
        [(3, "alpha beta"), (4, "epsilon zeta")], "doc_id long, text string"
    )
    handle(b1, 0)  # empty store: everything novel
    handle(b2, 1)  # batch 0's fingerprints are now history
    assert _read_flags(spark, out) == {
        (1, False),
        (2, False),
        (3, True),
        (4, False),
    }
    # the store now holds exactly the three distinct novel digests
    store_df = spark.read.parquet(store)
    assert store_df.select("content_hash").distinct().count() == 3


def test_replayed_batch_does_not_see_its_own_fingerprints(spark, tmp_path):
    # the at-least-once window: foreachBatch replays (batch_id, data)
    # after a crash. The replay must produce the SAME flags — the store
    # read excludes the batch's own partition, so first-attempt
    # fingerprints don't turn the replay's docs into "seen"
    store = str(tmp_path / "store")
    out = str(tmp_path / "flags")
    handle = incremental_dedup_batch_handler(store, out)
    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    handle(b1, 0)
    first = _read_flags(spark, out)
    handle(b1, 0)  # the replay
    assert _read_flags(spark, out) == first == {(1, False), (2, False)}
    # store unchanged too: the replayed partition replaced itself
    assert spark.read.parquet(store).count() == 2


def test_corrupt_store_surfaces_instead_of_flagging_novel(spark, tmp_path):
    # only a MISSING store means "first batch"; any other read failure
    # (corrupt footer, permissions) must raise — silently taking the
    # empty-history branch would flag known duplicates as novel AND
    # append their digests, corrupting store and output both.
    import os

    import pytest

    store = str(tmp_path / "store")
    out = str(tmp_path / "flags")
    os.makedirs(store)
    with open(os.path.join(store, "garbage.parquet"), "w") as fh:
        fh.write("this is not a parquet file")
    handle = incremental_dedup_batch_handler(store, out)
    b = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    with pytest.raises(Exception, match="(?i)parquet|footer|magic"):
        handle(b, 0)
    # and nothing was appended to the (broken) store or the output
    assert not os.path.exists(out)
