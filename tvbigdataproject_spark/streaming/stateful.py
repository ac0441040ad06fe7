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
