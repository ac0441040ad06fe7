"""Custom stateful streaming operators via applyInPandasWithState.

For aggregations the built-in windowed operators can't express —
arbitrary per-key accumulators, custom eviction, cross-batch logic —
Structured Streaming exposes applyInPandasWithState: the stream is
grouped by key, each micro-batch delivers that key's rows as Arrow
batches, and an explicit GroupState survives between batches.

State discipline at scale: state lives in the state store per key —
keep it fixed-width (here: two scalars per user), and configure a
timeout when keys churn (NoTimeout here because the user population is
bounded; use ProcessingTimeTimeout + state.setTimeoutDuration for
unbounded key spaces so idle keys evict).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def streaming_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum of value) maintained across
    micro-batches; emits each key's updated totals per batch."""

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


USER_PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_event_types", LongType()),
        StructField("n_events", LongType()),
    ]
)


def streaming_user_profile(events: DataFrame) -> DataFrame:
    """Per-user profile via transformWithStateInPandas (Spark 4's
    successor to applyInPandasWithState): typed state variables instead
    of one monolithic tuple — a MapState of per-event-type counts plus a
    ValueState total — emitting (user, distinct event types seen,
    events seen) after each batch the user appears in.

    Why the new API matters at scale: state is addressed per variable
    per key in the (RocksDB-backed) state store, so touching one
    event-type counter doesn't rewrite the whole user blob, and TTL /
    timers are first-class when key spaces are unbounded. Requires
    ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider (set per-test; the HDFS-backed default
    store does not support transformWithState) and the google.protobuf
    package (the Python state server's wire format — absent in this
    container, so tests/test_streaming_tws.py skip-guards exactly like
    the spaCy tier).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._type_counts = handle.getMapState(
                "type_counts", "event_type STRING", "n BIGINT"
            )
            self._total = handle.getValueState("total", "n BIGINT")

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            total = self._total.get()[0] if self._total.exists() else 0
            for pdf in rows:
                total += len(pdf)
                for etype, n in pdf.groupby("event_type").size().items():
                    prev = (
                        self._type_counts.getValue((etype,))[0]
                        if self._type_counts.containsKey((etype,))
                        else 0
                    )
                    self._type_counts.updateValue((etype,), (prev + int(n),))
            self._total.update((int(total),))
            n_types = sum(1 for _ in self._type_counts.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_event_types": [n_types],
                    "n_events": [int(total)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=USER_PROFILE_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
