"""Session-scoped materialized trade edge table, shared by the graph
family.

Every trade-graph query (katz, pagerank, bfs/sssp, k-core, LPA /
modularity / conductance, MIS, WL, betweenness, homophily, ...) starts
from the same derived table: the DISTINCT (customer, supplier) pairs of
``lineitem JOIN orders`` — the canonical edge set the reference's graph
builders also derive once per pipeline (reference
``bigdata/RetweetGraph.py`` builds its edge list once and hands it to
every downstream stage; here the "edge build" is the li⋈orders
distinct, the single most expensive subplan in the tier: 7.6 s of
Katz's 11.5 s sf1 profile before the r11 rewrite, and rebuilt
per-query by a dozen operators).

This module materializes that pair table ONCE per (SparkContext,
sf_dir) and hands out cheap projections of the checkpointed rows:

- the build applies the Katz treatment (graph9.py r11): size-gated
  SHUFFLE_HASH on the orders side — hash build measured 2x faster than
  the planner's SMJ at sf1, but the gate keeps the per-partition build
  side under the same bytes-per-task criterion AQE applies, because an
  ungated hint OOM'd the 16g JVM at c100 (SCALE.md r11 ladder); past
  the gate the sort-merge join (spills, never OOMs) takes over.
- the materialization is an eager ``localCheckpoint`` with tracked
  block ids (operators/components.py discipline). Consumers get lazy
  projections/unions over the checkpointed RDD, so an iterative
  operator's per-round scan reads materialized rows — no join
  recompute, and no per-query re-materialization either.
- the cache is keyed by ``sc.applicationId`` (ADVICE r11: raw RDD ids
  are small sequential ints scoped to a SparkContext, so a stash that
  survives a context restart could release unrelated RDDs in the new
  context — entries from a different application id are dropped, never
  unpersisted against the live context) and guarded by a lock; a lost
  build race releases the loser's blocks and reuses the winner.

At 100 TB the same shape holds: the pair table is orders-of-magnitude
smaller than lineitem (bounded by |customers| x |suppliers| active
pairs), and on a real cluster the session-scoped checkpoint becomes a
bucketed table (``sources/io.py::write_bucketed``; the r11 3-layout
ladder measured bucketed-by-src dropping 2 of 3 per-round exchanges,
42% faster at c100).
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tvbigdataproject_spark.operators.components import (
    _checkpoint_tracked,
    _unpersist_ids,
)
from tvbigdataproject_spark.sources import read_table

_LOCK = threading.RLock()
# (applicationId, abspath(sf_dir), variant) -> (checkpointed df, ids)
_CACHE: dict[tuple[str, str, str], tuple[DataFrame, frozenset[int]]] = {}


def _joined_pairs(spark, sf_dir: str):
    """The li⋈orders pair stream (pre-aggregate), with the size-gated
    SHUFFLE_HASH hint on the orders side."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    o_sel = orders.select("o_orderkey", "o_custkey")
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        o_bytes = sum(
            os.path.getsize(f.removeprefix("file:"))
            for f in orders.inputFiles()
        )
    except OSError:
        o_bytes = None
    if o_bytes is not None and o_bytes <= nparts * (2 << 20):
        o_sel = o_sel.hint("SHUFFLE_HASH")
    return (
        li.select("l_orderkey", "l_suppkey")
        .join(o_sel, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_suppkey")
    )


def _cached(spark, sf_dir: str, variant: str, build) -> DataFrame:
    sc = spark.sparkContext
    app = sc.applicationId
    key = (app, os.path.abspath(sf_dir), variant)
    with _LOCK:
        for stale in [k for k in _CACHE if k[0] != app]:
            # dead-context entries: drop WITHOUT unpersist — the ids
            # are meaningless (and dangerous) in the live context
            del _CACHE[stale]
        hit = _CACHE.get(key)
        if hit is not None:
            return hit[0]
    # build outside the lock (it runs a job); a concurrent duplicate
    # build is benign — the loser's blocks are released below
    ck, ids = _checkpoint_tracked(build(spark, sf_dir), sc)
    with _LOCK:
        again = _CACHE.get(key)
        if again is not None:
            _unpersist_ids(sc, ids)
            return again[0]
        _CACHE[key] = (ck, frozenset(ids))
        return ck


def trade_pairs(spark, sf_dir: str) -> DataFrame:
    """Distinct (o_custkey, l_suppkey) trade pairs, materialized once
    per (SparkContext, sf_dir) and reused by every caller."""
    return _cached(
        spark,
        sf_dir,
        "distinct",
        lambda sp, d: _joined_pairs(sp, d).distinct(),
    )


def trade_pair_counts(spark, sf_dir: str) -> DataFrame:
    """(o_custkey, l_suppkey, n) — line-item multiplicity per pair,
    the weighted variant pagerank / personalized-pagerank / sssp key
    on. Same one-shuffle cost as the distinct (a keyed partial-agg
    count instead of a dedup), cached separately."""
    return _cached(
        spark,
        sf_dir,
        "counts",
        lambda sp, d: _joined_pairs(sp, d)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("n")),
    )


def trade_edges(spark, sf_dir: str) -> DataFrame:
    """Directed (src=o_custkey, dst=-l_suppkey) edges — a lazy
    projection over the shared checkpointed pair table."""
    p = trade_pairs(spark, sf_dir)
    return p.select(
        F.col("o_custkey").alias("src"),
        (-F.col("l_suppkey")).alias("dst"),
    )


def trade_edges_bi(spark, sf_dir: str) -> DataFrame:
    """Bidirected trade edges (both orientations of every pair)."""
    e = trade_edges(spark, sf_dir)
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def release_trade_pairs(spark) -> None:
    """Release this context's cached pair tables (tests / bench
    teardown; entries otherwise live for the session, by design)."""
    sc = spark.sparkContext
    app = sc.applicationId
    with _LOCK:
        for k in [k for k in _CACHE if k[0] == app]:
            _df, ids = _CACHE.pop(k)
            _unpersist_ids(sc, set(ids))
        for k in [k for k in _CACHE if k[0] != app]:
            del _CACHE[k]
