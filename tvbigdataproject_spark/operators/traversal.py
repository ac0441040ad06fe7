"""Graph traversal operators: BFS hop levels and triangle counting.

Rounds out the iterative-graph tier (components, pagerank) with the two
other classic distributed-graph shapes:

- **BFS levels** — frontier expansion, the building block of
  shortest-hop queries and k-hop reachability. Same iterative MapReduce
  discipline as operators/components.py: per-round join + distinct,
  eager localCheckpoint lineage truncation, deterministic release of the
  superseded round's blocks (VERDICT r2 item 5 discipline). The frontier
  is the only thing that grows; visited-set membership is an anti-join,
  never a driver-side set.

- **Triangle counting** — the degree-ordered wedge-join algorithm:
  orient every undirected edge from the lower-(degree, id) endpoint to
  the higher, enumerate wedges at each triangle's lowest-rank corner,
  close them with one more equi-join. Orientation bounds the wedge count
  at O(m^1.5) regardless of skew (a celebrity node of degree d produces
  d^2 wedges un-oriented but only counts wedges among its *higher*-rank
  neighbors oriented — the standard mitigation, cf. Suri & Vassilvitskii
  "Counting Triangles and the Curse of the Last Reducer", WWW'11).
  Because a triangle is enumerated exactly once no matter the
  orientation, the result is identical to the naive id-ordered 3-way
  self-join the DuckDB oracle runs — the optimization is invisible to
  correctness, which is the point.

Both operators take plain edge DataFrames (no GraphFrames — SURVEY.md
§1.1 graph representation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tvbigdataproject_spark.operators.components import (
    _checkpoint_tracked,
    _unpersist_ids,
)


def _input_edges(
    edges: DataFrame, src: str, dst: str, sc, input_materialized: bool
) -> tuple[DataFrame, set[int]]:
    """The static edge set every round re-reads. By default it is
    defensively deduped and eagerly checkpointed (the upstream plan may
    be an expensive join chain that must not replay per round).

    ``input_materialized=True`` is the caller's declaration that the
    edges are ALREADY distinct and backed by materialized rows (e.g. a
    projection over the session's checkpointed trade-pair table,
    operators/trade_edges.py) — the per-round scan then reads the
    existing blocks directly and the operator skips one exchange + one
    checkpoint job + a duplicate copy of the edge blocks (r12 verdict
    item 7: every trade-graph query paid a second checkpoint of rows
    the session had already checkpointed)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if input_materialized:
        return e, set()
    return _checkpoint_tracked(e.distinct(), sc)


def bfs_levels(
    edges: DataFrame,
    source: int,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    checkpoint_interval: int = 2,
    input_materialized: bool = False,
) -> DataFrame:
    """Minimum hop count from `source` to every node reachable within
    `max_hops` directed hops. Returns (node, hop) with hop in
    [0, max_hops]; unreachable nodes are absent.

    Each round is one equi-join (frontier onto out-edges) + distinct +
    anti-join against the visited set — all shuffle-partitioned by node
    id. The visited set is checkpointed every ``checkpoint_interval``
    hops (each hop references the previous visited plan three times —
    anti-join, union, frontier filter — so in-span lineage grows
    ~3^k; keep k small, the default 2 halves the fixed per-job cost
    without plan blowup) and the superseded span's blocks are released
    the moment the next span materializes. At 100 TB the frontier join
    inherits whatever partitioning `edges` carries; for repeated BFS
    over one graph, pre-bucket `edges` by `src` so every round's join
    is co-located.
    """
    sc = edges.sparkSession.sparkContext
    # materialize the (static) edge set once — every hop's frontier join
    # re-reads it, and the upstream plan may be an expensive join chain
    e, e_ids = _input_edges(edges, src, dst, sc, input_materialized)
    spark = edges.sparkSession
    start = spark.createDataFrame(
        [(int(source), 0)], schema="node long, hop int"
    )
    try:
        visited, visited_ids = _checkpoint_tracked(start, sc)
    except Exception:
        _unpersist_ids(sc, e_ids)
        raise
    try:
        hop = 0
        while hop < max_hops:
            span = min(max(1, checkpoint_interval), max_hops - hop)
            plan = visited
            for _ in range(span):
                hop += 1
                frontier = plan.where(F.col("hop") == hop - 1)
                nxt = (
                    frontier.join(e, frontier.node == e.src)
                    .select(F.col("dst").alias("node"))
                    .distinct()
                    .join(plan, "node", "left_anti")
                    .select("node", F.lit(hop).cast("int").alias("hop"))
                )
                plan = plan.unionByName(nxt)
            stepped, stepped_ids = _checkpoint_tracked(plan, sc)
            _unpersist_ids(sc, visited_ids)
            visited, visited_ids = stepped, stepped_ids
    except Exception:
        _unpersist_ids(sc, visited_ids)
        raise
    finally:
        # the returned visited set is materialized — the edge blocks are
        # dead regardless of how we leave the loop
        _unpersist_ids(sc, e_ids)
    return visited


def bfs_levels_multi(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    checkpoint_interval: int = 2,
    input_materialized: bool = False,
) -> DataFrame:
    """Multi-source BFS: minimum hop count from EVERY node in `sources`
    (a one-column DataFrame of node ids, column `node`) to every node
    within `max_hops`. Returns (landmark, node, hop). This is the
    landmark-distance primitive behind closeness/eccentricity estimates
    and graph-diameter lower bounds: k BFS sweeps share one frontier
    keyed by (landmark, node) instead of running k sequential BFS loops
    — the round count stays max_hops, not k * max_hops.

    Same per-round shape and checkpoint-release discipline as
    bfs_levels; the visited set is composite-keyed, so memory is
    bounded by k * |reachable| — choose k (the landmark count) small
    and fixed, which is how landmark methods are used.
    """
    sc = edges.sparkSession.sparkContext
    e, e_ids = _input_edges(edges, src, dst, sc, input_materialized)
    start = sources.select(
        F.col("node").alias("landmark"),
        F.col("node"),
        F.lit(0).cast("int").alias("hop"),
    )
    try:
        visited, visited_ids = _checkpoint_tracked(start, sc)
    except Exception:
        _unpersist_ids(sc, e_ids)
        raise
    try:
        hop = 0
        while hop < max_hops:
            span = min(max(1, checkpoint_interval), max_hops - hop)
            plan = visited
            for _ in range(span):
                hop += 1
                frontier = plan.where(F.col("hop") == hop - 1)
                nxt = (
                    frontier.join(e, frontier.node == e.src)
                    .select("landmark", F.col("dst").alias("node"))
                    .distinct()
                    .join(plan, ["landmark", "node"], "left_anti")
                    .select(
                        "landmark", "node", F.lit(hop).cast("int").alias("hop")
                    )
                )
                plan = plan.unionByName(nxt)
            stepped, stepped_ids = _checkpoint_tracked(plan, sc)
            _unpersist_ids(sc, visited_ids)
            visited, visited_ids = stepped, stepped_ids
    except Exception:
        _unpersist_ids(sc, visited_ids)
        raise
    finally:
        _unpersist_ids(sc, e_ids)
    return visited


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    checkpoint_interval: int = 2,
    input_materialized: bool = False,
) -> DataFrame:
    """Bounded-round k-core peel: `rounds` iterations of "drop every
    node with degree < k, recompute degrees". Returns (node, deg) for
    survivors with their residual degree. Feed a bidirectional edge list
    for undirected semantics (then out-degree IS degree).

    With unbounded rounds this converges to the true k-core; a fixed
    round count keeps the computation reproducible and lets the oracle
    replay it as unrolled CTEs (same reasoning as the fixed-K pagerank —
    operators/pagerank.py docstring). Each round is one keyed aggregate
    (degrees) + two semi-joins (filter both endpoints), all partitioned
    by node id; the edge set only shrinks, so per-round cost is
    monotonically decreasing. Lineage is truncated every
    ``checkpoint_interval`` rounds (each round references the previous
    edge plan three times — degree agg + both semi-joins — so in-span
    lineage grows ~3^k; the default 2 halves the fixed per-job cost
    without plan blowup) with the checkpoint-release discipline of
    operators/components.py.
    """
    sc = edges.sparkSession.sparkContext
    e, e_ids = _input_edges(edges, src, dst, sc, input_materialized)
    try:
        rounds_done = 0
        while rounds_done < rounds:
            span = min(max(1, checkpoint_interval), rounds - rounds_done)
            plan = e
            for _ in range(span):
                keep = (
                    plan.groupBy("src")
                    .agg(F.count(F.lit(1)).alias("deg"))
                    .where(F.col("deg") >= k)
                    .select(F.col("src").alias("node"))
                )
                plan = (
                    plan.join(keep, plan.src == keep.node, "left_semi")
                    .join(keep, F.col("dst") == keep.node, "left_semi")
                )
            stepped, stepped_ids = _checkpoint_tracked(plan, sc)
            rounds_done += span
            _unpersist_ids(sc, e_ids)
            e, e_ids = stepped, stepped_ids
    except Exception:
        _unpersist_ids(sc, e_ids)
        raise
    return e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )


def triangle_corner_counts(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    materialize: bool = False,
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph
    given as unique (a, b) pairs. Returns (node, n_triangles) for every
    node in at least one triangle.

    Degree-ordered orientation (see module docstring): rank nodes by
    (degree, id), orient edges low→high rank, wedge-join at the low
    corner, close with an equi-join. Every join is corpus×corpus so the
    shuffle-hash strategy is pinned per the repo convention
    (operators/dedup.py docstring for the SHUFFLE_HASH-vs-MERGE
    tradeoff).

    The oriented edge table is consumed three times (both wedge sides +
    the closing probe); only the wedge sides share a partitioning, so
    Spark's exchange reuse cannot collapse the closing branch and the
    upstream of `pairs` is recomputed once more. ``materialize=True``
    caches the oriented table (``persist``, MEMORY_AND_DISK) so the pair
    generator runs once and all three branches read the cache — use it
    when the generator is expensive (e.g. a shingle self-join).
    ``persist`` rather than an eager localCheckpoint, deliberately: it
    keeps the operator lazy (plan-only callers — explain, tests — still
    trigger no job), it dedupes all three references within the single
    downstream action, and because this is a one-shot operator (not an
    O(rounds) loop) the ContextCleaner releasing the blocks when the
    result goes out of scope is sufficient — there is no accumulation
    for the iterative tier's tracked-release discipline to prevent. In
    production the near-dup pair table is a dedup output that already
    exists on disk, and the default stays lazy for that case.
    """
    e = pairs.select(F.col(a).alias("u"), F.col(b).alias("v")).distinct()
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orientation rank is the (deg, node) pair; comparing structs gives
    # the lexicographic order natively, no dense rank shuffle needed.
    # Degree attaches are corpus×corpus — shuffle-hash pinned like every
    # other pair join (operators/dedup.py docstring for the tradeoff).
    ranked = (
        e.hint("SHUFFLE_HASH")
        .join(
            deg.withColumnRenamed("node", "u")
            .withColumnRenamed("deg", "du")
            .hint("SHUFFLE_HASH"),
            "u",
        )
        .join(
            deg.withColumnRenamed("node", "v")
            .withColumnRenamed("deg", "dv")
            .hint("SHUFFLE_HASH"),
            "v",
        )
    )
    u_lower = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(u_lower, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(u_lower, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(u_lower, F.struct("dv", "v")).otherwise(F.struct(F.col("du").alias("dv"), F.col("u").alias("v"))).alias("hi_rank"),
    ).select("lo", "hi", "hi_rank")
    if materialize:
        oriented = oriented.persist()
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = (
        x.hint("SHUFFLE_HASH")
        .join(
            y.hint("SHUFFLE_HASH"),
            (F.col("x.lo") == F.col("y.lo"))
            & (F.col("x.hi_rank") < F.col("y.hi_rank")),
        )
        .select(
            F.col("x.lo").alias("corner"),
            F.col("x.hi").alias("p"),
            F.col("y.hi").alias("q"),
        )
    )
    closing = oriented.select(
        F.col("lo").alias("p"), F.col("hi").alias("q")
    )
    triangles = wedges.hint("SHUFFLE_HASH").join(
        closing.hint("SHUFFLE_HASH"), ["p", "q"]
    )
    return (
        triangles.select(
            F.explode(F.array("corner", "p", "q")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def sssp_bounded(
    edges: DataFrame,
    source: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    checkpoint_interval: int = 2,
    input_materialized: bool = False,
) -> DataFrame:
    """Single-source shortest path bounded to ``rounds`` relaxation
    rounds (Bellman-Ford): (node, dist) where dist is the minimum total
    integer edge weight over any path from ``source`` using at most
    ``rounds`` edges. With rounds >= |V|-1 this is the exact SSSP on a
    non-negative-weight graph; at a fixed small bound it is the
    deterministic "distance within k hops" semantics that an unrolled
    SQL oracle can mirror layer-for-layer.

    Each round is one equi-join (current distances onto out-edges) +
    union + min-aggregate, all shuffle-partitioned by node id — the
    same per-round shape as pagerank (one join, one keyed agg), so the
    same checkpoint-every-k discipline bounds lineage while halving
    fixed per-job overhead. Parallel edges are pre-collapsed to their
    minimum weight so the per-round join fan-out is the simple-edge
    count.
    """
    sc = edges.sparkSession.sparkContext
    e_sel = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("long").alias("w"),
    )
    if input_materialized:
        # caller declares (src, dst) already unique (parallel edges
        # pre-collapsed) and the rows materialized — see _input_edges
        e, e_ids = e_sel, set()
    else:
        e, e_ids = _checkpoint_tracked(
            e_sel.groupBy("src", "dst").agg(F.min("w").alias("w")), sc
        )
    spark = edges.sparkSession
    dist = spark.createDataFrame([(int(source), 0)], schema="node long, dist long")
    try:
        dist, dist_ids = _checkpoint_tracked(dist, sc)
    except Exception:
        _unpersist_ids(sc, e_ids)
        raise
    try:
        done = 0
        while done < rounds:
            span = min(max(1, checkpoint_interval), rounds - done)
            plan = dist
            for _ in range(span):
                done += 1
                relaxed = plan.join(e, plan.node == e.src).select(
                    F.col("dst").alias("node"),
                    (F.col("dist") + F.col("w")).alias("dist"),
                )
                plan = (
                    plan.unionByName(relaxed)
                    .groupBy("node")
                    .agg(F.min("dist").alias("dist"))
                )
            stepped, stepped_ids = _checkpoint_tracked(plan, sc)
            _unpersist_ids(sc, dist_ids)
            dist, dist_ids = stepped, stepped_ids
    except Exception:
        _unpersist_ids(sc, dist_ids)
        raise
    finally:
        _unpersist_ids(sc, e_ids)
    return dist


def luby_mis(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    checkpoint_interval: int = 1,
    input_materialized: bool = False,
) -> DataFrame:
    """Bounded-round Luby maximal-independent-set over an undirected
    graph (feed a bidirectional edge list). Returns (node, round) for
    every node selected into the MIS within `rounds` rounds.

    Luby's algorithm, the canonical symmetry-breaking primitive of
    distributed graph computing (coloring, scheduling, correlation
    clustering all reduce to it): each round every still-active node
    draws a priority, joins the set iff its priority beats every
    active neighbor's, and winners plus their neighbors deactivate.
    Here the "random" priority is the md5-portable 16-bit hash of the
    node id, extended with the id itself to break hash collisions —
    fully deterministic, so the unrolled SQL oracle replays the exact
    run (the fixed-K reproducibility discipline of pagerank/kcore).

    Per round: one neighbor-min keyed agg + two anti-joins, all
    node-id-partitioned; the active set only shrinks. Lineage is
    truncated every `checkpoint_interval` rounds (each round references
    the active plan three times, so in-span growth is ~3^k — keep the
    interval small, as in kcore_peel; default 1 = truncate every round).
    """
    from tvbigdataproject_spark.functions.hashing import hex16_hash

    sc = edges.sparkSession.sparkContext
    e, e_ids = _input_edges(edges, src, dst, sc, input_materialized)
    # priority key: 16-bit hash in the high bits, the (shifted) node id
    # in the low bits -> unique, positive, portable to SQL arithmetic
    pkey = (
        hex16_hash(F.col("node").cast("string")) * F.lit(4294967296).cast("long")
        + (F.col("node") + F.lit(2147483648).cast("long"))
    )
    try:
        active, active_ids = _checkpoint_tracked(
            e.select(F.col("src").alias("node"))
            .distinct()
            .select("node", pkey.alias("pkey")),
            sc,
        )
    except Exception:
        _unpersist_ids(sc, e_ids)
        raise
    # empty (node, round) frame with node's real type — so rounds=0
    # returns a DataFrame (not None) and unions stay type-stable
    selected = active.select(
        "node", F.lit(0).cast("int").alias("round")
    ).where(F.lit(False))
    selected_ids: set = set()
    try:
        for r in range(1, rounds + 1):
            nb = active.select(
                F.col("node").alias("nb_node"), F.col("pkey").alias("nb_pkey")
            )
            nbmin = (
                e.join(nb, e.dst == nb.nb_node)
                .groupBy("src")
                .agg(F.min("nb_pkey").alias("m"))
            )
            sel = (
                active.join(nbmin, active.node == nbmin.src, "left")
                .where(F.col("m").isNull() | (F.col("pkey") < F.col("m")))
                .select("node", F.lit(r).cast("int").alias("round"))
            )
            removed = (
                e.join(sel.select(F.col("node").alias("s")), e.src == F.col("s"))
                .select(F.col("dst").alias("node"))
                .distinct()
            )
            nxt = (
                active.join(sel.select("node"), "node", "left_anti")
                .join(removed, "node", "left_anti")
            )
            out = selected.unionByName(sel)
            if r % checkpoint_interval == 0 or r == rounds:
                stepped, stepped_ids = _checkpoint_tracked(out, sc)
                nxt_cp, nxt_ids = _checkpoint_tracked(nxt, sc)
                _unpersist_ids(sc, active_ids | selected_ids)
                active, active_ids = nxt_cp, nxt_ids
                selected, selected_ids = stepped, stepped_ids
                # the freshly tracked blocks become the new ancestors
                # the next un-checkpointed spans build on
            else:
                # in-span round: keep the plan lazy; the last
                # materialized ancestors (active_ids/selected_ids) must
                # survive until the next truncation point
                active, selected = nxt, out
    finally:
        # the returned selected set stays materialized; everything else
        # is dead
        _unpersist_ids(sc, e_ids | active_ids)
    return selected


def dag_longest_path_levels(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
    input_materialized: bool = False,
) -> DataFrame:
    """(node, level) for a DAG: level = length of the LONGEST path from
    any source to the node (sources are level 0) — the topological
    stratification used for dependency scheduling and, composed with
    strongly_connected_components, for condensation-DAG analysis.

    Iterative max-propagation: level(v) = max(level(v),
    max over in-edges u->v of level(u) + 1), from all-zeros. Levels are
    monotone non-decreasing and bounded by the DAG depth, so the
    fixpoint is exact and "no change" is the correctness proof. On a
    graph WITH a cycle the recursion has no fixpoint — the
    ``max_rounds`` guard raises, doubling as a cycle detector (levels
    on a cycle grow without bound).

    Each round is one corpus-partitioned equi-join + groupBy-max with
    eager tracked checkpointing (the connected_components discipline).
    """
    sc = edges.sparkSession.sparkContext
    e_sel = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if input_materialized:
        e, e_ids = e_sel, set()
    else:
        e, e_ids = _checkpoint_tracked(e_sel.distinct(), sc)
    lvl, lvl_ids = _checkpoint_tracked(
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .select("node", F.lit(0).cast("int").alias("level")),
        sc,
    )
    try:
        for _ in range(max_rounds):
            incoming = (
                e.join(
                    lvl.select(
                        F.col("node").alias("s"), F.col("level").alias("lu")
                    ),
                    "s",
                )
                .groupBy(F.col("d").alias("node"))
                .agg((F.max("lu") + 1).alias("lin"))
            )
            stepped = lvl.join(incoming, "node", "left").select(
                "node",
                F.greatest(
                    F.col("level"), F.coalesce("lin", F.col("level"))
                ).alias("level"),
            )
            new_lvl, new_ids = _checkpoint_tracked(stepped, sc)
            changed = (
                new_lvl.join(
                    lvl.select("node", F.col("level").alias("old")), "node"
                )
                .where(F.col("level") != F.col("old"))
                .head(1)
            )
            _unpersist_ids(sc, lvl_ids)
            lvl, lvl_ids = new_lvl, new_ids
            if not changed:
                return lvl
        raise RuntimeError(
            f"dag_longest_path_levels: no fixpoint in {max_rounds} rounds "
            "(deep DAG or a cycle — levels on a cycle grow without bound)"
        )
    except Exception:
        _unpersist_ids(sc, lvl_ids)
        raise
    finally:
        _unpersist_ids(sc, e_ids)


def _collect_graph(e: DataFrame, sources: DataFrame):
    """Driver-side (edges, source-nodes) of a sub-threshold graph; the
    caller gates entry on the edge count (see components._scc_local)."""
    edge_rows = [(r[0], r[1]) for r in e.collect()]
    src_rows = [r[0] for r in sources.select("node").distinct().collect()]
    return edge_rows, src_rows


def _bfs_masks_local(edge_rows, src_rows) -> dict:
    """(node -> mask) fixpoint of the fused bidirectional sweep, serial:
    bit 1 propagates along the edges, bit 2 along their reverses,
    sources start (and stay) at 3 — exactly reachable_masks' invariant
    (per-bit-per-node visitation, OR-accumulated)."""
    fwd: dict = {}
    rev: dict = {}
    for s, d in edge_rows:
        fwd.setdefault(s, []).append(d)
        rev.setdefault(d, []).append(s)
    mask: dict = {n: 3 for n in src_rows}
    frontier = list(mask)
    while frontier:
        nxt: dict = {}
        for v in frontier:
            m = mask[v]
            if m & 1:
                for w in fwd.get(v, ()):
                    if not (mask.get(w, 0) | nxt.get(w, 0)) & 1:
                        nxt[w] = nxt.get(w, 0) | 1
            if m & 2:
                for w in rev.get(v, ()):
                    if not (mask.get(w, 0) | nxt.get(w, 0)) & 2:
                        nxt[w] = nxt.get(w, 0) | 2
        for w, b in nxt.items():
            mask[w] = mask.get(w, 0) | b
        frontier = list(nxt)
    return mask


def reachable_set(
    edges: DataFrame,
    sources: DataFrame,
    max_rounds: int = 50,
    src: str = "src",
    dst: str = "dst",
    input_materialized: bool = False,
    local_edge_threshold: int | None = None,
) -> DataFrame:
    """All nodes reachable from ANY node of ``sources`` (a one-column
    DataFrame, column ``node``), sources included — the plain
    multi-source reachability primitive (bfs_levels_multi without the
    per-landmark key: when only MEMBERSHIP matters, carrying the
    landmark multiplies frontier memory by |sources| for nothing).
    Used by the bow-tie decomposition (IN = reaches core under the
    reversed edges, OUT = reached from core).

    Each round is one frontier equi-join + anti-join against the
    visited set, eagerly checkpointed with tracked release; the loop
    stops at the empty-frontier fixpoint (round count = eccentricity
    of the source set, not max_rounds). ``max_rounds`` raises rather
    than return a silently truncated set.
    """
    sc = edges.sparkSession.sparkContext
    e, e_ids = _input_edges(edges, src, dst, sc, input_materialized)
    # r13 size-gated driver-local endgame (components._scc_local
    # rationale): a sub-threshold graph's whole frontier loop —
    # O(eccentricity) full-barrier rounds of 3 jobs each — collapses
    # to one count + one bounded collect + a serial BFS. Same visited
    # set by construction.
    from tvbigdataproject_spark.operators.components import (
        _local_threshold,
        _SCC_LOCAL_EDGES_DEFAULT,
    )

    if local_edge_threshold is None:
        local_edge_threshold = _local_threshold(
            "SPARK_GRAFT_REACH_LOCAL_EDGES", _SCC_LOCAL_EDGES_DEFAULT
        )
    if local_edge_threshold > 0 and e.count() <= local_edge_threshold:
        try:
            edge_rows, src_rows = _collect_graph(e, sources)
        finally:
            _unpersist_ids(sc, e_ids)
        reached = set(src_rows)
        adj: dict = {}
        for s_, d_ in edge_rows:
            adj.setdefault(s_, []).append(d_)
        frontier = list(reached)
        while frontier:
            nxt = []
            for v in frontier:
                for w in adj.get(v, ()):
                    if w not in reached:
                        reached.add(w)
                        nxt.append(w)
            frontier = nxt
        from pyspark.sql.types import StructField, StructType

        node_field = sources.select("node").schema[0]
        return edges.sparkSession.createDataFrame(
            [(n,) for n in reached],
            StructType([StructField("node", node_field.dataType, False)]),
        )
    try:
        visited, visited_ids = _checkpoint_tracked(
            sources.select("node").distinct(), sc
        )
    except Exception:
        _unpersist_ids(sc, e_ids)
        raise
    frontier, frontier_ids = visited, set()
    try:
        for _ in range(max_rounds):
            nxt = (
                frontier.join(e, frontier.node == e.src)
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(visited, "node", "left_anti")
            )
            nxt, nxt_ids = _checkpoint_tracked(nxt, sc)
            if nxt.limit(1).count() == 0:
                _unpersist_ids(sc, nxt_ids)
                _unpersist_ids(sc, frontier_ids)
                return visited
            new_vis, new_vis_ids = _checkpoint_tracked(
                visited.unionByName(nxt), sc
            )
            _unpersist_ids(sc, visited_ids)
            _unpersist_ids(sc, frontier_ids)
            visited, visited_ids = new_vis, new_vis_ids
            frontier, frontier_ids = nxt, nxt_ids
        _unpersist_ids(sc, frontier_ids)
        raise RuntimeError(
            f"reachable_set: frontier not empty after {max_rounds} rounds"
        )
    except Exception:
        _unpersist_ids(sc, visited_ids)
        raise
    finally:
        _unpersist_ids(sc, e_ids)


def reachable_masks(
    edges: DataFrame,
    sources: DataFrame,
    max_rounds: int = 50,
    src: str = "src",
    dst: str = "dst",
    input_materialized: bool = False,
    local_edge_threshold: int | None = None,
) -> DataFrame:
    """(node, mask) for every node reachable from ``sources`` in either
    edge direction, in ONE frontier loop: mask bit 1 = reachable FROM
    the sources along the edges (forward sweep), bit 2 = reachable
    along the REVERSED edges (i.e. the node reaches the sources).
    Sources carry mask 3.

    This is the fused twin of two reachable_set calls (r9 verdict item
    5): the bow-tie decomposition ran independent forward and reversed
    sweeps, and on an iterative frontier loop the dominant cost is
    rounds x fixed job latency — not per-round data. Tagging each edge
    with a direction bit (forward edges b=1, reversed copies b=2) and
    letting a frontier row (node, newbits) expand only across edges
    whose bit it carries runs both BFS waves through the SAME join,
    SAME shuffle, SAME checkpoint per round, so the loop ends after
    max(ecc_fwd, ecc_rev) rounds instead of ecc_fwd + ecc_rev.

    Per-bit-per-node visitation happens at most once (a node re-enters
    the frontier only with bits it newly acquired), so total work
    matches the two-sweep version while the round count halves. Eager
    checkpoint + tracked release per round; ``max_rounds`` raises
    rather than return a truncated set.
    """
    sc = edges.sparkSession.sparkContext
    # base edge set, one orientation: materialized by the caller's
    # declaration, or defensively deduped + checkpointed here (half the
    # blocks of the pre-r13 shape, which checkpointed the DOUBLED
    # direction-tagged table; the tagged union below is distinct by
    # construction over a distinct base — the b column separates the
    # branches — and re-deriving it per round is two narrow cached
    # scans).
    base, base_ids = _input_edges(edges, src, dst, sc, input_materialized)
    # r13 size-gated driver-local endgame (components._scc_local
    # rationale): below the edge threshold the fused two-wave frontier
    # loop — max(ecc_fwd, ecc_rev) rounds x (checkpoint + probe +
    # checkpoint) jobs — collapses to one count + one bounded collect
    # + a serial two-bit BFS. Identical (node, mask) fixpoint.
    from tvbigdataproject_spark.operators.components import (
        _local_threshold,
        _SCC_LOCAL_EDGES_DEFAULT,
    )

    if local_edge_threshold is None:
        local_edge_threshold = _local_threshold(
            "SPARK_GRAFT_REACH_LOCAL_EDGES", _SCC_LOCAL_EDGES_DEFAULT
        )
    if local_edge_threshold > 0 and base.count() <= local_edge_threshold:
        try:
            edge_rows, src_rows = _collect_graph(base, sources)
        finally:
            _unpersist_ids(sc, base_ids)
        mask = _bfs_masks_local(edge_rows, src_rows)
        from pyspark.sql.types import (
            IntegerType,
            StructField,
            StructType,
        )

        node_field = sources.select("node").schema[0]
        return edges.sparkSession.createDataFrame(
            sorted(mask.items()),
            StructType(
                [
                    StructField("node", node_field.dataType, False),
                    StructField("mask", IntegerType(), False),
                ]
            ),
        )
    e2, e_ids = (
        base.withColumn("b", F.lit(1)).unionByName(
            base.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            ).withColumn("b", F.lit(2))
        ),
        base_ids,
    )
    try:
        visited, visited_ids = _checkpoint_tracked(
            sources.select("node").distinct().withColumn("mask", F.lit(3)),
            sc,
        )
    except Exception:
        _unpersist_ids(sc, e_ids)
        raise
    frontier, frontier_ids = visited, set()
    try:
        for _ in range(max_rounds):
            prop = (
                frontier.join(e2, frontier.node == e2.src)
                .where(F.col("mask").bitwiseAND(F.col("b")) != 0)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.bit_or("b").alias("mbits"))
            )
            nxt = (
                prop.join(
                    visited.select("node", F.col("mask").alias("vmask")),
                    "node",
                    "left",
                )
                .select(
                    "node",
                    F.col("mbits")
                    .bitwiseAND(
                        F.bitwise_not(F.coalesce("vmask", F.lit(0)))
                    )
                    .alias("mask"),
                )
                .where(F.col("mask") != 0)
            )
            nxt, nxt_ids = _checkpoint_tracked(nxt, sc)
            if nxt.limit(1).count() == 0:
                _unpersist_ids(sc, nxt_ids)
                _unpersist_ids(sc, frontier_ids)
                return visited
            new_vis, new_vis_ids = _checkpoint_tracked(
                visited.unionByName(nxt)
                .groupBy("node")
                .agg(F.bit_or("mask").alias("mask")),
                sc,
            )
            _unpersist_ids(sc, visited_ids)
            _unpersist_ids(sc, frontier_ids)
            visited, visited_ids = new_vis, new_vis_ids
            frontier, frontier_ids = nxt, nxt_ids
        _unpersist_ids(sc, frontier_ids)
        raise RuntimeError(
            f"reachable_masks: frontier not empty after {max_rounds} rounds"
        )
    except Exception:
        _unpersist_ids(sc, visited_ids)
        raise
    finally:
        _unpersist_ids(sc, e_ids)
