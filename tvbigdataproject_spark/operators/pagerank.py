"""Fixed-iteration PageRank over a weighted edge DataFrame.

Companion iterative operator to connected components
(operators/components.py) — same MapReduce shape, different fixpoint:
each round is one join (ranks onto out-edge shares) + one keyed
aggregate (contributions per destination) + one left join back onto the
node set, everything shuffle-partitioned by node id, nothing on the
driver.

Variant: fixed K iterations, uniform init 1/N, damped update

    rank_k(v) = (1-d)/N + d * Σ_{u→v} rank_{k-1}(u) * w(u,v) / outw(u)

with NO dangling-mass redistribution (documented choice — the simple
variant; dangling nodes leak mass, which is fine for relative ranking
and keeps the computation local). Convergence-to-tolerance is a trivial
loop-condition change but makes the round count data-dependent; fixed K
keeps it reproducible and lets the DuckDB oracle replay the exact
computation as K unrolled CTEs (queries/graph2.py).

Bitwise reproducibility across engines: the per-destination sum is the
scaled-integer trick from queries/_stable.py — each contribution is
rounded at 1e-12 and summed as BIGINT (exact, associative, order-free),
so Spark's partial aggregation and DuckDB's single-threaded sum produce
identical doubles every iteration. Total rank mass is ≤ 1, so the
scaled sum stays far inside BIGINT at any graph size. The damping
constants are literal doubles (0.85, 0.15) on both sides — never
computed as 1 - d, which DuckDB would do in exact DECIMAL and Spark in
double, diverging in the last bits.

Scale notes (100 TB): lineage is truncated per round with eager
localCheckpoint and the superseded round's blocks are released
deterministically (components' _checkpoint_tracked/_unpersist_ids —
VERDICT r2 item 5 discipline); on a real cluster prefer reliable
checkpoint() with a checkpoint dir. Skewed in-degree (celebrity nodes)
is handled by the opt-in `salt_buckets` two-phase contribution sum —
bitwise-identical to the unsalted path and off by default at bench
scales (see the function docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tvbigdataproject_spark.operators.components import (
    _checkpoint_tracked,
    _unpersist_ids,
)

_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    base_num: float = 0.15,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    checkpoint_interval: int = 3,
    salt_buckets: int | None = None,
    sources: DataFrame | None = None,
    input_materialized: bool = False,
) -> DataFrame:
    """Ranks for every node appearing as a source in `edges` (feed a
    bidirectional edge list for undirected semantics — then the src set
    IS the node set). Returns (node, rank).

    `sources` switches to PERSONALIZED PageRank: a one-column (`node`)
    DataFrame of teleport targets. Init and teleport mass concentrate
    uniformly on that set (1/|S| and base_num/|S|; zero elsewhere)
    instead of spreading 1/N over all nodes — the random walk restarts
    at the sources, so ranks measure proximity to them (the
    recommendation / trust-propagation primitive). The set must be
    small and bounded (landmarks, a user's seeds) — it is broadcast
    onto the node table. Sources not present in the graph's node set
    are DROPPED before |S| is counted (a node with no out-edges has no
    rank row to carry mass, so counting it would silently leak its
    1/|S| share of the teleport mass); everything else (contribution
    rounds, scaled
    integer sums, checkpoint discipline) is byte-for-byte the same
    loop, and the uniform variant is untouched when sources is None.

    `base_num` is the literal teleport numerator (1 - damping); it is a
    parameter, not computed, for cross-engine bit-identity (see module
    docstring).

    `checkpoint_interval` amortizes the fixed ~1 s/job materialization
    cost: ranks are localCheckpointed every that-many rounds instead of
    every round. Each round references the previous rank plan exactly
    once (join → agg → left join), so in-span lineage grows linearly —
    k can be higher here than in the self-referencing BFS/k-core loops.
    Ranks are bitwise independent of checkpoint placement (the
    scaled-integer sums are exact); only the job count changes.

    `salt_buckets` spreads each destination's contribution sum over
    that many reducers (two-phase: groupBy(dst, salt) partials, then
    groupBy(dst) of at most `salt_buckets` partial rows) — the
    mitigation for celebrity nodes whose in-degree makes one reducer
    the straggler, same shape as salted_type_counts. The salt is a
    deterministic hash of the *source* id, so it is stable under
    retries and varies within a hot destination. Because the partials
    are scaled-integer (exact, associative) sums, the salted result is
    bitwise identical to the unsalted one at any bucket count
    (tests/test_pagerank.py proves it on a ~1e5-in-degree hub). Off by
    default: the extra shuffle stage only pays for itself under real
    skew.
    """
    sc = edges.sparkSession.sparkContext
    # The input plan may be arbitrarily expensive (a join chain, a
    # near-dup pair generator) — materialize it ONCE. Without this every
    # reference to the derived static tables (nodes in each round's left
    # join, shares, the node count) replays the upstream plan: at sf0.1
    # that recompute, not per-round job overhead, dominated the query.
    # ``input_materialized``: the caller declares the edges already
    # backed by materialized rows (session trade tables) — e is then a
    # narrow cast projection over the existing blocks and only the
    # derived outw/shares tables materialize (r13, traversal's
    # _input_edges contract).
    e_sel = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("double").alias("w"),
    )
    if input_materialized:
        e, e_ids = e_sel, set()
    else:
        e, e_ids = _checkpoint_tracked(e_sel, sc)
    try:
        # out-weights double as the node set (the node set IS the src
        # set — see docstring), so one grouped materialization serves
        # both every round's left join and the normalization join; no
        # separate distinct pass
        outw, outw_ids = _checkpoint_tracked(
            e.groupBy("src").agg(F.sum("w").alias("ow")), sc
        )
    except Exception:
        _unpersist_ids(sc, e_ids)
        raise
    nodes = outw.select(F.col("src").alias("node"))
    try:
        # normalized once up front: contribution of u→v is
        # rank(u) * share(u,v); checkpointed because every iteration
        # re-reads it
        shares, shares_ids = _checkpoint_tracked(
            e.join(outw, "src").select(
                "src", "dst", (F.col("w") / F.col("ow")).alias("share")
            ),
            sc,
        )
    except Exception:
        _unpersist_ids(sc, e_ids | outw_ids)
        raise
    # every iteration consumer reads shares/nodes — the raw edge blocks
    # are dead the moment shares is materialized
    _unpersist_ids(sc, e_ids)

    if sources is None:
        n = nodes.count()
        nodes = nodes.select("node", F.lit(base_num / n).alias("base"))
        init = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    else:
        # personalized: teleport mass concentrates on the source set.
        # |S| is bounded by contract, so the membership mark is a
        # broadcast left join; base_num/|S| and 1/|S| are plain double
        # divisions (the oracle must force DOUBLE division too —
        # DuckDB's 0.15/3 would be DECIMAL arithmetic)
        # restrict to sources that exist in the graph FIRST: an
        # out-of-graph source has no rank row, so counting it in |S|
        # would silently drop its share of the teleport mass. One
        # id-only semi join against the node table (sources is bounded;
        # the shuffled side carries a single id column), and the
        # reduced set is what both |S| and the membership mark see.
        in_graph = sources.select(F.col("node").alias("s_node")).join(
            nodes, F.col("s_node") == nodes.node, "left_semi"
        )
        s_cnt = in_graph.count()
        if s_cnt == 0:
            raise ValueError(
                "personalized pagerank: no source node exists in the graph"
            )
        marked = nodes.join(
            F.broadcast(in_graph),
            nodes.node == F.col("s_node"),
            "left",
        )
        in_s = F.col("s_node").isNotNull()
        nodes = marked.select(
            "node",
            F.when(in_s, F.lit(base_num / float(s_cnt)))
            .otherwise(F.lit(0.0))
            .alias("base"),
        )
        init = marked.select(
            "node",
            F.when(in_s, F.lit(1.0 / float(s_cnt)))
            .otherwise(F.lit(0.0))
            .alias("rank"),
        )
    ranks, ranks_ids = _checkpoint_tracked(init, sc)
    try:
        rounds_done = 0
        while rounds_done < n_iter:
            span = min(max(1, checkpoint_interval), n_iter - rounds_done)
            plan = ranks
            for _ in range(span):
                scaled = F.round(F.col("rank") * F.col("share") * _SCALE).cast(
                    "long"
                )
                joined = shares.join(plan, shares.src == plan.node)
                if salt_buckets:
                    contrib = (
                        joined.withColumn(
                            "_salt",
                            F.pmod(F.xxhash64("src"), F.lit(salt_buckets)),
                        )
                        .groupBy("dst", "_salt")
                        .agg(F.sum(scaled).alias("_part"))
                        .groupBy("dst")
                        .agg((F.sum("_part") / float(_SCALE)).alias("contrib"))
                    )
                else:
                    contrib = joined.groupBy("dst").agg(
                        (F.sum(scaled) / float(_SCALE)).alias("contrib")
                    )
                plan = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
                    "node",
                    (
                        F.col("base")
                        + damping * F.coalesce(F.col("contrib"), F.lit(0.0))
                    ).alias("rank"),
                )
            stepped, stepped_ids = _checkpoint_tracked(plan, sc)
            rounds_done += span
            # the superseded span is dead the moment the new one is
            # materialized — release it now, don't wait for GC
            _unpersist_ids(sc, ranks_ids)
            ranks, ranks_ids = stepped, stepped_ids
    finally:
        _unpersist_ids(sc, shares_ids | outw_ids)
    return ranks
