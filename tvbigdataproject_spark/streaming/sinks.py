"""Production sink patterns for Structured Streaming.

The memory sink (events.py::run_to_memory_sink) is a test helper; real
pipelines write files or external systems. The subtlety is exactly-once:
Structured Streaming guarantees each micro-batch is delivered at least
once to foreachBatch — after a crash between "sink wrote" and
"checkpoint committed", the SAME batch id is replayed. A sink is
exactly-once iff the (batch_id, data) write is idempotent.

The parquet pattern here makes it idempotent structurally: every batch
writes to its own `_batch_id=N` partition with dynamic partition
overwrite, so a replayed batch REPLACES its own partition instead of
appending duplicates. Readers `spark.read.parquet(path)` and simply drop
the `_batch_id` column (or prune on it for incremental consumption).

At 100 TB the same shape holds — per-batch partitions keep the overwrite
scoped (never mode("overwrite") on the root), and downstream compaction
can fold small batch partitions into date partitions asynchronously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_batch_idempotent(df: DataFrame, batch_id: int, path: str) -> None:
    """Idempotent single-batch write: replace exactly this batch's
    partition. Safe to call any number of times with the same
    (batch_id, data) — the invariant foreachBatch replay needs."""
    (
        df.withColumn("_batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(path)
    )


def start_idempotent_parquet_sink(
    stream_df: DataFrame, path: str, checkpoint: str, available_now: bool = True
):
    """foreachBatch parquet sink with exactly-once semantics via
    per-batch dynamic partition overwrite + checkpointed progress."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        write_batch_idempotent(batch_df, batch_id, path)

    writer = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
