"""Warehouse maintenance batch: slowly-changing-dimension builds.

scd2_user_state turns the append-only `events` feed into a Type-2
slowly-changing dimension of each user's state (their event_type),
with [valid_from, valid_to) validity intervals and an is_current
flag — the standard Kimball SCD2 shape every warehouse derives from a
change-data feed. It composes the gaps-and-islands run collapse
(queries/analytic3.py event_type_runs) with an interval close-out
LEAD, so consecutive observations of the same state become ONE
dimension row instead of one row per event.

Reference parity: the reference engine exposes windowed ranking and
per-entity ordering (see SURVEY.md §2 W1/W2); SCD2 is the composed
warehouse op those primitives exist for.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "scd2_user_state",
    sql="""
    WITH numbered AS (
        SELECT user_id, event_type, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn_all,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn_type
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type,
               MIN(ts) AS valid_from,
               MIN(rn_all) AS seq,
               COUNT(*) AS n_events
        FROM numbered
        GROUP BY user_id, event_type, rn_all - rn_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY seq)
               AS valid_to,
           (LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY seq)
               IS NULL) AS is_current,
           n_events
    FROM runs
    """,
    tags=("warehouse", "scd", "window", "gaps-islands"),
)
def scd2_user_state(spark, sf_dir):
    """Type-2 SCD build of per-user state from the events feed: each
    maximal run of consecutive same-type events becomes one dimension
    row with valid_from = run start, valid_to = next run's start
    (NULL + is_current for the open row), and the run's event count.

    Determinism: the event order is totalized by (ts, event_id), and
    the interval close-out LEAD orders runs by MIN(rn_all) — the run's
    position in that total order — not by valid_from, because two
    adjacent runs can share a start timestamp (same-ts events of
    different types) and valid_from alone would leave the close-out
    engine-dependent.

    Scale shape: every window and the run-collapse grouping partition
    by user_id (or a refinement of it), so ONE hash exchange on
    user_id feeds the island numbering, the collapse, and the LEAD —
    no global sort anywhere. Per-user history length bounds the sort
    buffers exactly as in event_type_runs; dimension output size is
    the number of state CHANGES, not events, so the sink shrinks as
    feeds get chattier.
    """
    ev = read_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    numbered = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.row_number().over(w_all).alias("rn_all"),
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias(
            "grp"
        ),
    )
    runs = numbered.groupBy("user_id", "event_type", "grp").agg(
        F.min("ts").alias("valid_from"),
        F.min("rn_all").alias("seq"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_seq = Window.partitionBy("user_id").orderBy("seq")
    valid_to = F.lead("valid_from").over(w_seq)
    return runs.select(
        "user_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        "n_events",
    )


# Point-in-time probes: each sampled event asks "what was this user's
# dimension state 30 minutes after the event fired?" — probing mid-run
# (same row) and across close-outs (next row), so the join is
# non-degenerate even though dimension and probes derive from one feed.
_PIT_SAMPLE_MOD = 100


@query(
    "pit_join_scd2",
    sql=f"""
    WITH numbered AS (
        SELECT user_id, event_type, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn_all,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn_type
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type,
               MIN(ts) AS valid_from,
               MIN(rn_all) AS seq,
               COUNT(*) AS n_events
        FROM numbered
        GROUP BY user_id, event_type, rn_all - rn_type
    ),
    dim AS (
        SELECT user_id, event_type, valid_from,
               LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY seq)
                   AS valid_to
        FROM runs
    ),
    probes AS (
        SELECT event_id, user_id,
               ts + INTERVAL 30 MINUTE AS probe_ts
        FROM events
        WHERE event_id % {_PIT_SAMPLE_MOD} = 0
    )
    SELECT p.event_id, p.user_id, p.probe_ts,
           d.event_type AS state_type, d.valid_from, d.valid_to
    FROM probes p
    LEFT JOIN dim d
      ON p.user_id = d.user_id
     AND d.valid_from <= p.probe_ts
     AND (d.valid_to IS NULL OR p.probe_ts < d.valid_to)
    """,
    tags=("warehouse", "scd", "asof"),
)
def pit_join_scd2(spark, sf_dir):
    """Point-in-time (PIT) lookup against the Type-2 dimension that
    scd2_user_state builds: for a 1-in-100 probe sample of events,
    the user's state row valid exactly 30 minutes after the event —
    the standard consumption pattern of an SCD2 dimension (feature
    stores call it the point-in-time-correct join; it is what keeps
    training features leakage-free). Validity intervals partition each
    user's timeline, so every probe matches AT MOST one row (LEFT join
    keeps probes earlier than the user's first observed state).

    Scale shape: the dimension and the probes co-partition on
    user_id — one equi-join with the interval test as a residual
    filter; per-user dimension fan-in is bounded by that user's state
    CHANGES (not events). No global sort, no range-join explosion.
    """
    ev = read_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    numbered = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.row_number().over(w_all).alias("rn_all"),
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias(
            "grp"
        ),
    )
    runs = numbered.groupBy("user_id", "event_type", "grp").agg(
        F.min("ts").alias("valid_from"),
        F.min("rn_all").alias("seq"),
    )
    w_seq = Window.partitionBy("user_id").orderBy("seq")
    dim = runs.select(
        "user_id",
        F.col("event_type").alias("state_type"),
        "valid_from",
        F.lead("valid_from").over(w_seq).alias("valid_to"),
    )
    probes = ev.where(F.col("event_id") % _PIT_SAMPLE_MOD == 0).select(
        "event_id",
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("probe_ts"),
    )
    return probes.join(
        dim,
        (probes.user_id == dim.user_id)
        & (dim.valid_from <= probes.probe_ts)
        & (dim.valid_to.isNull() | (probes.probe_ts < dim.valid_to)),
        "left",
    ).select(
        "event_id",
        probes.user_id.alias("user_id"),
        "probe_ts",
        "state_type",
        "valid_from",
        "valid_to",
    )
