"""PageRank operator: hand-checkable fixtures + invariants. (Value-level
parity vs the unrolled-CTE DuckDB oracle is tools/check_parity.py.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tvbigdataproject_spark.operators.pagerank import pagerank


def _bidirectional(spark, pairs):
    e = spark.createDataFrame(pairs, ["src", "dst", "w"])
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )


def test_symmetric_pair_stays_uniform(spark):
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(_bidirectional(spark, [(1, 2, 1.0)]), n_iter=3).collect()
    }
    # a perfectly symmetric graph keeps the uniform distribution exactly
    assert ranks[1] == pytest.approx(0.5, abs=1e-9)
    assert ranks[2] == pytest.approx(0.5, abs=1e-9)


def test_chain_center_dominates_and_mass_conserved(spark):
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(
            _bidirectional(spark, [(1, 2, 1.0), (2, 3, 1.0)]), n_iter=1
        ).collect()
    }
    # one iteration from uniform: center b receives both endpoints' full
    # mass: 0.05 + 0.85*(2/3); endpoints get half of b's: 0.05 + 0.85/6
    assert ranks[2] == pytest.approx(0.05 + 0.85 * 2 / 3, abs=1e-9)
    assert ranks[1] == pytest.approx(0.05 + 0.85 / 6, abs=1e-9)
    assert ranks[1] == ranks[3]
    # bidirectional graph has no dangling nodes: mass conserved up to
    # the 1e-12 contribution rounding
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)


def test_weight_bias_shifts_rank(spark):
    # triangle with one heavy edge: the heavy edge's endpoints outrank
    # the third node
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(
            _bidirectional(spark, [(1, 2, 10.0), (2, 3, 1.0), (1, 3, 1.0)]),
            n_iter=5,
        ).collect()
    }
    assert ranks[1] > ranks[3]
    assert ranks[2] > ranks[3]
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)


def test_no_persistent_rdd_growth_across_runs(spark):
    edges = _bidirectional(spark, [(i, i + 1, 1.0) for i in range(1, 30)])
    sc = spark.sparkContext

    def n_persistent() -> int:
        return sc._jsc.getPersistentRDDs().size()

    pagerank(edges, n_iter=4).count()
    before = n_persistent()
    pagerank(edges, n_iter=4).count()
    # each run may keep its own final checkpoint alive but must release
    # every intermediate round (VERDICT r2 item 5 discipline)
    assert n_persistent() <= before + 1


def test_salted_hub_bitwise_equals_unsalted(spark):
    # one celebrity node with in-degree ~1e5: the salted two-phase
    # contribution sum must spread the hot destination across buckets
    # AND stay bitwise-identical to the unsalted path (the partials are
    # exact scaled-integer sums, so reduction order cannot matter)
    n = 100_000
    hub = 0
    e = (
        spark.range(1, n + 1)
        .select(
            F.col("id").alias("src"),
            F.lit(hub).alias("dst"),
            F.lit(1.0).alias("w"),
        )
        # a thin back-edge set so the hub is not dangling
        .unionByName(
            spark.range(1, 51).select(
                F.lit(hub).alias("src"),
                F.col("id").alias("dst"),
                F.lit(1.0).alias("w"),
            )
        )
    )
    plain = {r["node"]: r["rank"] for r in pagerank(e, n_iter=2).collect()}
    salted = {
        r["node"]: r["rank"]
        for r in pagerank(e, n_iter=2, salt_buckets=16).collect()
    }
    assert salted == plain  # dict equality on floats == bitwise identity
    # the salt actually spreads the hub's contributions: its sources
    # land in many distinct buckets, not one straggler partition
    n_buckets = (
        e.where(F.col("dst") == hub)
        .select(F.pmod(F.xxhash64("src"), F.lit(16)).alias("b"))
        .distinct()
        .count()
    )
    assert n_buckets == 16


def test_personalized_pagerank_mass_stays_with_seed_component(spark):
    # two disconnected 2-cycles; teleport set in the first — every node
    # of the second component must rank exactly 0.0 (no teleport, no
    # inflow), and seed-component ranks must be positive
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 1.0), (10, 11, 1.0), (11, 10, 1.0)],
        "src long, dst long, w double",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.rank for r in pagerank(edges, n_iter=4, sources=seeds).collect()}
    assert got[10] == 0.0 and got[11] == 0.0
    assert got[1] > 0.0 and got[2] > 0.0
    # seed keeps the teleport mass: strictly above its non-seed peer
    # after an even round count
    assert got[1] > got[2]


def test_personalized_sources_outside_graph_are_dropped_from_mass(spark):
    # seed set {1, 99}: node 99 has no edges, so it must NOT dilute the
    # teleport mass — the run must equal a run seeded with {1} alone
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 1.0)], "src long, dst long, w double"
    )
    with_ghost = spark.createDataFrame([(1,), (99,)], "node long")
    only_real = spark.createDataFrame([(1,)], "node long")
    a = {r.node: r.rank for r in pagerank(edges, n_iter=3, sources=with_ghost).collect()}
    b = {r.node: r.rank for r in pagerank(edges, n_iter=3, sources=only_real).collect()}
    assert a == b
    # mass conservation: with the ghost dropped, total rank stays 1
    assert abs(sum(a.values()) - 1.0) < 1e-12


def test_personalized_all_sources_outside_graph_raises(spark):
    import pytest

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 1.0)], "src long, dst long, w double"
    )
    ghosts = spark.createDataFrame([(99,)], "node long")
    with pytest.raises(ValueError, match="no source node"):
        pagerank(edges, n_iter=2, sources=ghosts)
