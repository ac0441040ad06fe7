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
from pyspark.sql import functions as F
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


FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", LongType()),
    ]
)

_FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("min_view", LongType()),
        StructField("min_click", LongType()),
        StructField("min_purchase", LongType()),
    ]
)


def streaming_funnel_stage(events: DataFrame) -> DataFrame:
    """Per-user view→click→purchase funnel stage maintained across
    micro-batches — the streaming twin of
    queries/temporal3.py::funnel_view_click_purchase.

    The state is the three FIRST-TOUCH minima (as epoch micros; None
    until seen), not a stage counter: minima are associative and
    order-independent, so late or out-of-order events across
    micro-batches can never wedge the state into a wrong stage — a
    stage counter advanced on arrival order could miss a click that
    arrives before the earlier view that qualifies it. The emitted
    stage applies the exact comparisons of the batch query (click
    strictly after first view, purchase strictly after first click),
    so the last update per user equals the batch answer, which the
    equivalence test asserts. State is three scalars per user —
    fixed-width, NoTimeout because the user population is bounded
    (ProcessingTimeTimeout for unbounded key spaces).
    """

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        mv, mc, mp = state.get if state.exists else (None, None, None)

        def merge(cur, series):
            if series.empty:
                return cur
            new = int(series.min())
            return new if cur is None else min(cur, new)

        for pdf in pdf_iter:
            micros = pdf["ts"].astype("int64") // 1000
            mv = merge(mv, micros[pdf["event_type"] == "view"])
            mc = merge(mc, micros[pdf["event_type"] == "click"])
            mp = merge(mp, micros[pdf["event_type"] == "purchase"])
        state.update((mv, mc, mp))
        stage = 0
        if mv is not None:
            stage = 1
            if mc is not None and mc > mv:
                stage = 2
                if mp is not None and mp > mc:
                    stage = 3
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CLAMPED_BALANCE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("bal_cents", LongType()),
    ]
)

_CLAMP_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("bal", LongType())]
)


def streaming_clamped_balance(events: DataFrame) -> DataFrame:
    """Per-user running balance clamped to [0, cap], maintained across
    micro-batches — the streaming twin of
    queries/analytic5.py::clamped_inventory_balance (same drain, same
    cap, same integer-cents walk).

    Unlike the funnel's state (minima — order-independent), the clamp
    walk is inherently ORDER-dependent, so the stream contract is the
    one every sequential-state stream op carries: each micro-batch
    must cover a time range at or after the previous one (a time-split
    log; rows within a batch are sorted here before walking). Under
    that contract the final emission per user is bitwise the batch
    walk's last row, which the equivalence tests assert both for a
    single batch and for a 3-way time-split arrival. Late data would
    need buffering + event-time timers instead (transformWithState's
    timer API is the tool; see streaming_user_profile).

    State is two integers per user — fixed-width, NoTimeout because
    the user population is bounded.
    """
    from tvbigdataproject_spark.queries.analytic5 import (
        _DRAIN_CENTS,
        _INVENTORY_CAP_CENTS,
    )

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        n, bal = state.get if state.exists else (0, 0)
        pdfs = list(pdf_iter)
        pdf = pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        deltas = (
            (pdf["value"] * 100).round().astype("int64") - _DRAIN_CENTS
        ).to_numpy()
        for d in deltas:
            bal = min(_INVENTORY_CAP_CENTS, max(0, bal + int(d)))
        n += len(pdf)
        state.update((n, int(bal)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "bal_cents": [int(bal)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=CLAMPED_BALANCE_SCHEMA,
        stateStructType=_CLAMP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SCD2_STREAM_SCHEMA = "user_id long, event_type string, valid_from_us long, valid_to_us long, is_current boolean, n_events long"
_SCD2_STATE_SCHEMA = "cur_type string, valid_from_us long, n_run long"


def streaming_scd2_state(events: DataFrame) -> DataFrame:
    """Streaming Type-2 SCD maintenance — the CDC-feed twin of
    queries/scd.py::scd2_user_state: per user, consecutive same-type
    events collapse into one dimension run; a type CHANGE closes the
    open run (emits it with valid_to = the change timestamp,
    is_current=false) and opens a new one; every batch re-emits the
    open run (is_current=true, valid_to null) in update mode.

    Same sequential-state stream contract as streaming_clamped_balance:
    micro-batches must arrive in time order (a time-split log; rows
    within a batch are sorted before walking). Under it, the closed
    runs plus the final open-run emission are exactly the batch build's
    rows — asserted by the equivalence test across a 3-way time-split
    arrival with a fresh state store.

    Interval bounds are emitted as integer epoch MICROS, not
    timestamps: the walk happens engine-side in pandas, and an integer
    keeps the emission decoupled from the source's ts flavor (the
    nanos/micros/NTZ history in sources/io.py) — the batch comparison
    casts once at the edge. State per user is one (type, start, count)
    triple — fixed-width, NoTimeout because the user population is
    bounded.
    """

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        cur_type, vf, n = state.get if state.exists else (None, 0, 0)
        pdfs = list(pdf_iter)
        pdf = pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        # tz-aware or naive both view to int64 ns since epoch
        ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
        types = pdf["event_type"].to_numpy()
        rows = []
        for t_us, etype in zip(ts_us, types):
            if cur_type is None:
                cur_type, vf, n = etype, int(t_us), 0
            elif etype != cur_type:
                rows.append((key[0], cur_type, vf, int(t_us), False, n))
                cur_type, vf, n = etype, int(t_us), 0
            n += 1
        state.update((cur_type, vf, n))
        rows.append((key[0], cur_type, vf, None, True, n))
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id",
                "event_type",
                "valid_from_us",
                "valid_to_us",
                "is_current",
                "n_events",
            ],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SCD2_STREAM_SCHEMA,
        stateStructType=_SCD2_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


INTERVAL_COALESCE_SCHEMA = (
    "user_id long, grp long, span_start_us long, span_end_us long, "
    "n_intervals long, is_open boolean"
)
_IVC_STATE_SCHEMA = "start_us long, end_us long, n_intervals long, n_closed long"


def streaming_interval_coalesce(events: DataFrame) -> DataFrame:
    """Streaming packing-intervals — the twin of
    queries/temporal4.py::interval_coalesce_user: per user, maintain
    the one OPEN span across micro-batches; an interval starting
    strictly after the open span's max end closes it (emitted with its
    1-based grp) and opens the next. Every batch re-emits the open span
    (is_open=true) so a consumer always sees current coverage; the
    closed emissions plus the final open one reconstruct the batch
    operator's rows exactly.

    The interval bounds are computed SPARK-SIDE before the stateful
    walk (same derivation as the batch query: integer micros, duration
    |round(value*10)| % 600 + 60 s) so the pandas walk touches only
    integers — pandas' round() is half-even and must never see the
    raw doubles.

    Same sequential-state contract as streaming_clamped_balance:
    micro-batches arrive in start-time order (a time-split log; rows
    within a batch are sorted before walking). State per user is four
    longs — fixed-width, NoTimeout (bounded user population); with
    unbounded keys this is where event-time timers + TTL go.
    """
    iv = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s_us"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + (
                F.abs(F.round(F.col("value") * 10).cast("long")) % 600
                + 60
            )
            * 1_000_000
        ).alias("e_us"),
    )

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            start, end, n, closed = state.get
            has_open = True
        else:
            start = end = n = closed = 0
            has_open = False
        pdfs = list(pdf_iter)
        pdf = pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values(["s_us", "e_us", "event_id"], kind="mergesort")
        rows = []
        for s, e in zip(
            pdf["s_us"].to_numpy(), pdf["e_us"].to_numpy()
        ):
            s, e = int(s), int(e)
            if not has_open:
                start, end, n, has_open = s, e, 1, True
            elif s > end:
                closed += 1
                rows.append((key[0], closed, start, end, n, False))
                start, end, n = s, e, 1
            else:
                end = max(end, e)
                n += 1
        state.update((start, end, n, closed))
        if has_open:
            rows.append((key[0], closed + 1, start, end, n, True))
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id",
                "grp",
                "span_start_us",
                "span_end_us",
                "n_intervals",
                "is_open",
            ],
        )

    return iv.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=INTERVAL_COALESCE_SCHEMA,
        stateStructType=_IVC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
