"""transformWithStateInPandas (Spark 4 stateful API): per-user profile
with typed state variables (MapState + ValueState), verified against the
batch equivalent. Requires the RocksDB state store provider — set for
this test only and restored after (the HDFS-backed default store does
not support transformWithState)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tvbigdataproject_spark.sources import read_table
from tvbigdataproject_spark.streaming import read_event_stream, run_to_memory_sink
from tvbigdataproject_spark.streaming.stateful import streaming_user_profile

SF_DIR = "/root/testdata/sf0.001"
_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


# TWS's Python state server speaks protobuf to the JVM; without the
# google.protobuf package the driver worker crashes at init. Same
# environment-blocked class as the spaCy tier (COVERAGE.md D6) — the
# operator and this equivalence test are real; the env lacks the dep.
pytestmark = pytest.mark.skipif(
    not _protobuf_available(),
    reason="google.protobuf not installed (transformWithState state server needs it)",
)


@pytest.fixture()
def rocksdb_state_store(spark):
    prev = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset(_PROVIDER_KEY)
    else:
        spark.conf.set(_PROVIDER_KEY, prev)


def test_tws_user_profile_matches_batch(spark, rocksdb_state_store):
    stream = read_event_stream(
        spark, f"{SF_DIR}/events.parquet", max_files_per_trigger=1
    )
    run_to_memory_sink(
        streaming_user_profile(stream), "t_profile", output_mode="update"
    )
    # update mode re-emits a key each batch it appears in; the final
    # (max-n_events) emission carries the complete profile
    emitted = (
        spark.table("t_profile")
        .groupBy("user_id")
        .agg(
            F.max("n_event_types").alias("n_event_types"),
            F.max("n_events").alias("n_events"),
        )
    )
    got = {
        r["user_id"]: (r["n_event_types"], r["n_events"]) for r in emitted.collect()
    }
    batch = (
        read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count_distinct("event_type").alias("n_types"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    want = {r["user_id"]: (r["n_types"], r["n"]) for r in batch.collect()}
    assert got == want
