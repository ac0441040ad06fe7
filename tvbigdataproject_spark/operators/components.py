"""Connected components over near-duplicate pair sets — the clustering
stage of the dedup story (north-star surface; the reference stops at
pairwise similarity edges, e.g. RetweetTagsJaccardGraph.py:177-183, and
never groups them).

A dedup pipeline that emits *pairs* is unfinished: to actually drop
duplicates you need each document's duplicate *cluster* and one
canonical survivor per cluster. Components-of-pairs is exactly that.

Design for 100 TB:
- iterative **min-label propagation with pointer jumping** (label
  doubling). Near-dup graphs are unions of shallow star/clique-shaped
  clusters, so propagation alone converges in 1-2 rounds; pointer
  jumping bounds pathological chains at O(log n) rounds (same shape as
  the large-star/small-star MapReduce algorithm of Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14).
- each round is two equi-joins + a groupBy-min, all shuffle-partitioned
  by node/label id. Nothing per-row ever reaches the driver — the loop
  condition is a scalar "any label changed?" count.
- both join sides are corpus-sized, so the shuffle-hash strategy is
  pinned (a size misestimate must never broadcast a per-node table;
  tradeoff vs MERGE under heap pressure: operators/dedup.py docstring).
- lineage is truncated with ``localCheckpoint`` every
  ``checkpoint_interval`` rounds — without truncation the plan grows
  per iteration and the driver, not the data, becomes the bottleneck;
  truncating *every* round instead pays a fixed materialization job per
  round, which dominates when rounds are cheap (measured ~1 s/round of
  pure job overhead at bench scale — VERDICT r3). The interval
  amortizes both: in-span lineage growth is linear and bounded by k.
  On a real cluster prefer reliable ``checkpoint()`` with a checkpoint
  dir (localCheckpoint ties the result to executor lifetime).
- each round's checkpoint is released **deterministically** once the
  next round is materialized: a checkpointed DataFrame's backing RDD
  lives outside the cacheManager, so it is otherwise freed only when
  Python GC happens to trigger the async ContextCleaner — on a
  long-lived session that leaves O(rounds) label tables cached
  nondeterministically. The ids are tracked by diffing
  ``getPersistentRDDs`` around each checkpoint and unpersisted
  explicitly (tests/test_components.py asserts no growth over a
  deep-chain multi-round run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _persistent_ids(sc) -> set[int]:
    """Ids of currently persisted RDDs (the checkpoint blocks live here)."""
    jmap = sc._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def _unpersist_ids(sc, ids: set[int]) -> None:
    """Release the persisted RDDs with these ids (non-blocking)."""
    if not ids:
        return
    jmap = sc._jsc.getPersistentRDDs()
    for k in jmap.keySet().toArray():
        if int(k) in ids:
            jmap.get(k).unpersist(False)


# localCheckpoint carries the ORIGINAL plan's ESTIMATED statistics onto
# the checkpointed leaf (originStats), and the size-only stats visitor
# multiplies join children's sizes — so an iterative operator whose
# round contains a self-join SQUARES the estimate every round, a power
# tower that first makes Catalyst's BigInt arithmetic the bottleneck
# (minutes of driver CPU inside BigInteger.multiply) and then overflows
# BigInteger's magnitude cap outright ("BigInteger would overflow
# supported range" — boruvka_msf at sf1 was the first to hit it, at
# ~2^(63 * 2^r) bits). Past this ceiling the estimate carries no
# information anyway, so the checkpoint is rebuilt as a fresh LogicalRDD
# over the SAME materialized rows (no recompute, same persisted blocks),
# whose stats fall back to the leaf default. Below the ceiling the
# inherited estimate is kept — it is what lets small checkpointed tables
# keep auto-broadcasting.
_STATS_BITLEN_CEILING = 96
# one-time flag: the stats rebuild failing is advisory but must not be
# silent (ADVICE r11) — warn on the first failure, then stay quiet
_STATS_REBUILD_WARNED = False


def _checkpoint_tracked(df: DataFrame, sc) -> tuple[DataFrame, set[int]]:
    """localCheckpoint(eager) + the ids of the RDDs it persisted, so the
    caller can release them the moment they stop being needed."""
    before = _persistent_ids(sc)
    out = df.localCheckpoint(eager=True)
    jdf = out._jdf
    try:
        # py4j hands scala.math.BigInt back as a plain Python int
        size = int(
            jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        blown = size.bit_length() > _STATS_BITLEN_CEILING
    except Exception:  # stats access is advisory, never fail the loop
        blown = False
    if blown:
        # internalCreateDataFrame is a private Spark API (pinned against
        # pyspark 4.1); if a future Spark renames it, keep the (valid,
        # just pessimistically-estimated) checkpoint rather than fail
        # the iteration — losing the stats reset degrades planning,
        # losing the checkpointed rows would break the run. The
        # degradation must be OBSERVABLE though (ADVICE r11): a silent
        # fallback would let the driver-CPU/BigInteger blowup the
        # rebuild exists to prevent quietly return, so the first
        # failure per process warns once with the real cause.
        try:
            spark = df.sparkSession
            fresh = spark._jsparkSession.internalCreateDataFrame(
                jdf.queryExecution().toRdd(), jdf.schema(), False
            )
            out = DataFrame(fresh, spark)
        except Exception as exc:
            global _STATS_REBUILD_WARNED
            if not _STATS_REBUILD_WARNED:
                _STATS_REBUILD_WARNED = True
                import warnings

                warnings.warn(
                    "checkpoint stats rebuild failed; keeping the "
                    "pessimistic size estimate (planning may degrade "
                    f"on deep iterative plans): {exc!r}",
                    RuntimeWarning,
                    stacklevel=2,
                )
    return out, _persistent_ids(sc) - before


_CC_LOCAL_EDGES_DEFAULT = 1_000_000


def _cc_local(spark, sym: DataFrame) -> DataFrame:
    """Exact connected components of a sub-threshold edge set, solved on
    the driver: union-find with path compression over the collected
    (a, b) rows, then component label = min member id — identical to
    the distributed min-propagation fixpoint. See _scc_local for the
    size-gate rationale (the caller bounds the collect)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for row in sym.collect():
        a, b = row[0], row[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    label: dict = {}
    for n in parent:
        r = find(n)
        if r not in label or n < label[r]:
            label[r] = n
    a_field = sym.schema[0]
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [
            StructField("node", a_field.dataType, False),
            StructField("label", a_field.dataType, False),
        ]
    )
    return spark.createDataFrame(
        [(n, label[find(n)]) for n in parent], schema=schema
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_interval: int = 2,
    local_edge_threshold: int | None = None,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component is the
    minimum node id reachable from the node (undirected).

    Converges when no label changes; raises if ``max_iter`` rounds were
    not enough (monotone-decreasing labels make the fixpoint the true
    component minimum, so a clean exit is a correctness proof, not a
    heuristic stop).

    ``checkpoint_interval`` amortizes the per-round fixed cost: the
    label table is materialized (eager localCheckpoint) and convergence
    is checked only every that-many rounds, so a span of k rounds costs
    2 jobs instead of 2k. Lineage within a span grows linearly (each
    round references the previous label plan a constant number of
    times) and is truncated at the span boundary. The span-end
    convergence check is exact, not delayed-by-up-to-k: labels are
    monotone non-increasing, so "no change across the whole span" is
    equivalent to "no change in any round of it". Results are
    checkpoint-placement-independent; only job count changes.
    """
    sc = edges.sparkSession.sparkContext
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # materialize the (static) symmetric edge set once: every round's
    # neighborhood join re-reads it, and the upstream plan is typically
    # the expensive part — for dedup_components it is the shingle
    # self-join pair generator, which must not be replayed per round
    sym, sym_ids = _checkpoint_tracked(
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))), sc
    )
    try:
        # r13 size-gated driver-local endgame (see _scc_local): once the
        # (already materialized) pair set is below the threshold, the
        # whole propagation loop — 2 jobs per span at best — collapses
        # to one cached count + one bounded collect + serial union-find.
        # Same labels; the count reads the fresh checkpoint, not the
        # expensive upstream.
        if local_edge_threshold is None:
            local_edge_threshold = _local_threshold(
                "SPARK_GRAFT_CC_LOCAL_EDGES", _CC_LOCAL_EDGES_DEFAULT
            )
        if local_edge_threshold > 0 and (
            sym.count() <= 2 * local_edge_threshold
        ):
            return _cc_local(edges.sparkSession, sym)
        return _cc_loop(sym, sc, max_iter, checkpoint_interval)
    finally:
        # the returned labels are materialized (checkpointed) — the edge
        # blocks are dead on every exit path
        _unpersist_ids(sc, sym_ids)


def _cc_loop(
    sym: DataFrame, sc, max_iter: int, checkpoint_interval: int
) -> DataFrame:
    labels, labels_ids = _checkpoint_tracked(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node")),
        sc,
    )
    rounds_done = 0
    while rounds_done < max_iter:
        span = min(max(1, checkpoint_interval), max_iter - rounds_done)
        # Two r12 probe changes, both exact (synchronous deterministic
        # update: a round that changes nothing IS the fixpoint, and the
        # min-propagation fixpoint is the component minimum):
        # (a) every round carries its PRE-round label as `_prev`, so
        #     the span-end convergence check reads the freshly
        #     checkpointed table alone (one cached-scan filter job)
        #     instead of shuffle-joining the new and old label tables;
        # (b) the criterion is "the LAST round changed nothing" rather
        #     than "the whole span changed nothing" — a span whose
        #     final round was already an identity terminates the loop
        #     immediately instead of paying one more full confirm span
        #     (at bench scale a span is ~10 fixed-cost jobs).
        plan = labels
        for _ in range(span):
            # refresh _prev to THIS round's starting label
            plan = plan.select(
                "node", "label", F.col("label").alias("_prev")
            )
            # min label over the neighborhood (node itself included below)
            nbr_min = (
                sym.hint("SHUFFLE_HASH")
                .join(
                    plan.select(F.col("node").alias("b"), "label").hint(
                        "SHUFFLE_HASH"
                    ),
                    "b",
                )
                .groupBy(F.col("a").alias("node"))
                .agg(F.min("label").alias("nbr_label"))
            )
            stepped = (
                plan.hint("SHUFFLE_HASH")
                .join(nbr_min.hint("SHUFFLE_HASH"), "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                    ).alias("label"),
                    "_prev",
                )
            )
            # pointer jumping: node -> label -> label(label), halves chain depth
            parent = stepped.select(
                F.col("node").alias("p_node"), F.col("label").alias("p_label")
            )
            plan = (
                stepped.hint("SHUFFLE_HASH")
                .join(
                    parent.hint("SHUFFLE_HASH"),
                    stepped.label == parent.p_node,
                    "left",
                )
                .select(
                    "node",
                    F.coalesce("p_label", "label").alias("label"),
                    "_prev",
                )
            )
        jumped, jumped_ids = _checkpoint_tracked(plan, sc)
        rounds_done += span
        changed = (
            jumped.where(F.col("label") != F.col("_prev")).limit(1).count()
        )
        # the old span's checkpoint is dead the moment `changed` is
        # computed — release it now instead of waiting for Python GC to
        # reach the async ContextCleaner (O(spans) cached label tables
        # on a long-lived session otherwise)
        _unpersist_ids(sc, labels_ids)
        labels, labels_ids = jumped, jumped_ids
        if changed == 0:
            # consumers see exactly (node, label); the carried _prev
            # column is an internal of the convergence probe
            return labels.select("node", "label")
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def canonical_survivors(
    docs: DataFrame,
    pair_edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Full-corpus dedup verdict: (id, component, keep).

    Every document gets its duplicate-cluster label (its own id when it
    has no near-dup partner) and a ``keep`` flag — true iff it is the
    cluster's minimum id. Downstream, ``WHERE keep`` is the deduped
    corpus. The left join is doc-table-sized on the left and
    components-of-paired-docs on the right (usually a small fraction),
    so AQE may broadcast the right side — that is fine and scale-safe:
    only *paired* docs appear there, not the corpus.
    """
    comp = connected_components(pair_edges, src=src, dst=dst).select(
        F.col("node").alias(id_col), F.col("label").alias("component")
    )
    out_component = F.coalesce(F.col("component"), F.col(id_col))
    return (
        docs.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            out_component.alias("component"),
            (out_component == F.col(id_col)).alias("keep"),
        )
    )


def label_propagation(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    checkpoint_interval: int = 2,
    input_materialized: bool = False,
) -> DataFrame:
    """Bounded-round synchronous label-propagation community detection
    (Raghavan et al. 2007) over an undirected graph (feed a
    bidirectional edge list). Returns (node, community) after exactly
    `rounds` synchronous sweeps.

    Every node starts in its own singleton community (label = own id);
    each round every node adopts the most frequent label among its
    neighbors, ties broken by the SMALLEST label — fully deterministic,
    so a fixed-round oracle replays the run exactly (the unrolled-SQL
    reproducibility discipline of pagerank/luby_mis; classic LPA's
    random tie-breaks and asynchronous schedules are deliberately
    traded for cross-engine bit-parity, as in GraphX's LPA which makes
    the same synchronous-deterministic tradeoff).

    Per round: one edges-to-labels equi-join (shuffle keyed on node
    id), one (node, label) count aggregation with map-side partials,
    and one per-node argmax window — everything partitions on the node
    id, nothing is all-pairs, per-node window state is bounded by the
    node's distinct neighbor-label count. Hub skew lands on the
    (node, label) count groupBy, which partial-aggregates before the
    shuffle. The labels table is checkpointed every
    `checkpoint_interval` rounds with tracked release (each round
    references the previous labels exactly once, so in-span lineage
    growth is linear — the pagerank discipline, not the 3^k MIS one).

    Bounded rounds are semantics, not a shortcut: synchronous LPA can
    oscillate on bipartite structure (two-coloring flip), so a
    convergence loop may never terminate; production systems run
    5-10 sweeps and take the snapshot. Callers wanting convergence
    detection can compare successive rounds' outputs.
    """
    from pyspark.sql import Window

    sc = edges.sparkSession.sparkContext
    e_sel = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if input_materialized:
        # caller declares the edge set distinct + materialized (see
        # traversal._input_edges) — per-round scans read the existing
        # blocks, no dedup exchange, no duplicate checkpoint (r13)
        e, e_ids = e_sel, set()
    else:
        e, e_ids = _checkpoint_tracked(e_sel.distinct(), sc)
    try:
        labels, labels_ids = _checkpoint_tracked(
            e.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("community")),
            sc,
        )
    except Exception:
        _unpersist_ids(sc, e_ids)
        raise
    try:
        done = 0
        while done < rounds:
            span = min(max(1, checkpoint_interval), rounds - done)
            plan = labels
            for _ in range(span):
                done += 1
                nb = plan.select(
                    F.col("node").alias("nb_node"),
                    F.col("community").alias("nb_label"),
                )
                cnt = (
                    e.hint("SHUFFLE_HASH")
                    .join(nb.hint("SHUFFLE_HASH"), e.dst == nb.nb_node)
                    .groupBy("src", "nb_label")
                    .agg(F.count(F.lit(1)).alias("c"))
                )
                w = Window.partitionBy("src").orderBy(
                    F.col("c").desc(), F.col("nb_label").asc()
                )
                plan = (
                    cnt.withColumn("rn", F.row_number().over(w))
                    .where(F.col("rn") == 1)
                    .select(
                        F.col("src").alias("node"),
                        F.col("nb_label").alias("community"),
                    )
                )
            stepped, stepped_ids = _checkpoint_tracked(plan, sc)
            _unpersist_ids(sc, labels_ids)
            labels, labels_ids = stepped, stepped_ids
    except Exception:
        _unpersist_ids(sc, labels_ids)
        raise
    finally:
        _unpersist_ids(sc, e_ids)
    return labels


def best_of_cluster_survivors(
    docs: DataFrame,
    pair_edges: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Quality-aware dedup verdict: (id, component, keep) where keep is
    true iff the document has the cluster's MAXIMUM ``quality_col``
    (ties to the smallest id; singletons always keep). Production
    pipelines keep the best copy of a duplicate cluster — longest /
    highest-quality-scored — not the arbitrary minimum id
    (canonical_survivors is that simpler min-id form).

    Plan: components over the pair graph (iterative, checkpointed),
    one corpus-sized left join on the id, then a per-cluster argmax
    window. The window partitions on the cluster label; its state is
    bounded by the largest duplicate cluster — the same bound the
    components computation already carries.
    """
    from pyspark.sql import Window

    comp = connected_components(pair_edges, src=src, dst=dst).select(
        F.col("node").alias(id_col), F.col("label").alias("component")
    )
    out_component = F.coalesce(F.col("component"), F.col(id_col))
    labeled = (
        docs.select(id_col, quality_col)
        .join(comp, id_col, "left")
        .select(id_col, quality_col, out_component.alias("component"))
    )
    w = Window.partitionBy("component").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return labeled.withColumn(
        "keep", F.row_number().over(w) == 1
    ).select(id_col, "component", quality_col, "keep")


def _local_threshold(env_var: str, default: int) -> int:
    """Edge-count gate for the driver-local solvers below, env-tunable
    per deployment (0 disables). Mirrors the size-gated SHUFFLE_HASH
    hint (operators/trade_edges.py): a constant that *bounds driver
    memory*, not one tuned to the local bench — 1M edges of two longs
    is ~16 MB collected, the same order as a routine broadcast build."""
    import os

    try:
        return int(os.environ.get(env_var, str(default)))
    except ValueError:
        return default


_SCC_LOCAL_EDGES_DEFAULT = 1_000_000


def _scc_local(spark, rem_e: DataFrame, rem_n: DataFrame) -> DataFrame:
    """Exact SCC of the (sub-threshold) remainder, solved on the driver:
    iterative Tarjan over the collected edge list, labels = min member
    id per SCC — identical output to the distributed FW-BW-Trim peel,
    in O(V+E) single-core time instead of O(condensation depth) full
    cluster barriers. The standard endgame of multistep SCC methods
    (Slota et al. 2014 switch to a serial algorithm once the remainder
    is small); the caller gates entry on the collected size."""
    edge_rows = rem_e.select("s", "d").collect()
    node_rows = rem_n.select("node").collect()
    adj: dict = {}
    for r in node_rows:
        adj[r[0]] = []
    for r in edge_rows:
        adj.setdefault(r[0], []).append(r[1])
        adj.setdefault(r[1], [])
    # Tarjan, iterative (no recursion-depth limit)
    index: dict = {}
    low: dict = {}
    on_stack: set = set()
    stack: list = []
    comp_of: dict = {}
    counter = 0
    for root in adj:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack.add(v)
            advanced = False
            nbrs = adj[v]
            while pi < len(nbrs):
                w = nbrs[pi]
                pi += 1
                if w not in index:
                    work[-1] = (v, pi)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on_stack:
                    if index[w] < low[v]:
                        low[v] = index[w]
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                label = min(members)
                for w in members:
                    comp_of[w] = label
            if work:
                parent, _ = work[-1]
                if low[v] < low[parent]:
                    low[parent] = low[v]
    node_field = rem_n.schema["node"]
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [
            StructField("node", node_field.dataType, False),
            StructField("scc", node_field.dataType, False),
        ]
    )
    return spark.createDataFrame(
        [(n, comp_of[n]) for n in adj], schema=schema
    )


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_peels: int = 30,
    max_rounds: int = 50,
    input_materialized: bool = False,
    local_edge_threshold: int | None = None,
) -> DataFrame:
    """(node, scc) for every node of the DIRECTED graph; scc is the
    minimum node id of the node's strongly connected component —
    connected_components' directed sibling (mutual reachability, the
    equivalence CC can't see: a DAG has only singleton SCCs).

    Algorithm: distributed Trim + Forward-color + Backward-sweep (the
    FW-BW-Trim family of Slota et al. / the coloring method of Orzan),
    peeled iteratively:

    1. TRIM — a node with no incoming or no outgoing edge in the
       remaining graph is its own SCC. Trim iterates to a FIXPOINT
       inside the peel (each pass exposes the next layer of sources/
       sinks), so the DAG-like mass of the condensation peels in one
       peel regardless of depth — a pure path graph trims away
       entirely in a single peel's inner passes. The inner loop is
       O(condensation depth) cheap anti-join passes, each removing at
       least one node (guaranteed termination); this replaces the
       round-8 shape where one trim pass per peel made a chain deeper
       than ~2*max_peels raise spuriously.
    2. FORWARD COLOR — propagate min node id along edge direction to a
       fixpoint: color(v) = min over forward-ancestors-and-self. Labels
       are monotone non-increasing, so the fixpoint is exact and the
       convergence check ("no label changed") is a correctness proof.
    3. BACKWARD SWEEP — every fixpoint root (color(v) == v) anchors one
       SCC: SCC(r) = {v : color(v) = r and v reaches r}, collected by a
       backward BFS from the roots restricted to same-color nodes. All
       discovered SCCs peel off together; edges touching them drop; the
       next peel runs on the remainder.

    Every round of every phase is two corpus-partitioned equi-joins +
    a groupBy (the connected_components shuffle shape), eagerly
    checkpointed with tracked release, and every loop's exit condition
    is a scalar count — nothing per-row reaches the driver. Rounds are
    data-dependent (bounded by the condensation depth); ``max_peels``/
    ``max_rounds`` raise rather than return a wrong fixpoint.
    """
    sc = edges.sparkSession.sparkContext
    spark = edges.sparkSession
    if local_edge_threshold is None:
        local_edge_threshold = _local_threshold(
            "SPARK_GRAFT_SCC_LOCAL_EDGES", _SCC_LOCAL_EDGES_DEFAULT
        )
    e0 = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).where(
        F.col(src) != F.col(dst)
    )
    if input_materialized:
        # caller declares the edge set distinct + materialized (see
        # traversal._input_edges): the self-edge filter stays (narrow,
        # over cached rows), the dedup exchange and duplicate
        # checkpoint go
        rem_e, rem_e_ids = e0, set()
    else:
        rem_e, rem_e_ids = _checkpoint_tracked(e0.distinct(), sc)
    rem_n, rem_n_ids = _checkpoint_tracked(
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct(),
        sc,
    )
    done: list[DataFrame] = []
    done_ids: list[set[int]] = []

    def _shrink(members: DataFrame) -> None:
        """Drop assigned nodes from the remaining graph (both tables
        re-checkpointed; previous blocks released)."""
        nonlocal rem_e, rem_e_ids, rem_n, rem_n_ids
        m = members.select("node")
        new_n, new_n_ids = _checkpoint_tracked(
            rem_n.join(m, "node", "left_anti"), sc
        )
        new_e, new_e_ids = _checkpoint_tracked(
            rem_e.join(m.select(F.col("node").alias("s")), "s", "left_anti")
            .join(m.select(F.col("node").alias("d")), "d", "left_anti"),
            sc,
        )
        _unpersist_ids(sc, rem_n_ids)
        _unpersist_ids(sc, rem_e_ids)
        rem_n, rem_n_ids = new_n, new_n_ids
        rem_e, rem_e_ids = new_e, new_e_ids

    try:
        for _ in range(max_peels):
            if not rem_n.head(1):
                break
            # r13: size-gated driver-local endgame. Once the remainder
            # is below the edge threshold, the FW-BW-Trim phase
            # structure (O(condensation depth) full-barrier rounds, the
            # dominant job count of the SCC family at bench scale —
            # bowtie was 159 jobs/rep) collapses to one count + one
            # bounded collect + one exact serial Tarjan. Same labels by
            # construction; the gate bounds driver memory the way the
            # broadcast threshold does.
            if local_edge_threshold > 0 and (
                rem_e.count() <= local_edge_threshold
            ):
                done.append(_scc_local(spark, rem_e, rem_n))
                done_ids.append(set())
                break
            # 1. TRIM to fixpoint: no in-edge or no out-edge ->
            # singleton SCC; each inner pass exposes the next layer,
            # and every pass removes >= 1 node or exits, so the loop
            # terminates in <= condensation-depth passes.
            #
            # r12 job-count cut: one FLAGGED node checkpoint per pass
            # (node, _t = trivial?) replaces the old three (trivial
            # table, shrunk node table, plus the union+distinct's extra
            # exchange inside the trivial plan). The trivial rows and
            # the surviving node set are both lazy filters over the one
            # checkpoint; its blocks transfer to the `done` bookkeeping
            # (they back the emitted SCC rows until the final union).
            while True:
                has_in = rem_e.select(F.col("d").alias("node")).distinct()
                has_out = rem_e.select(F.col("s").alias("node")).distinct()
                flagged, f_ids = _checkpoint_tracked(
                    rem_n.join(
                        has_in.withColumn("_i", F.lit(1)), "node", "left"
                    )
                    .join(has_out.withColumn("_o", F.lit(1)), "node", "left")
                    .select(
                        "node",
                        (
                            F.col("_i").isNull() | F.col("_o").isNull()
                        ).alias("_t"),
                    ),
                    sc,
                )
                if not flagged.where("_t").head(1):
                    _unpersist_ids(sc, f_ids)
                    break
                trivial = flagged.where("_t").select(
                    "node", F.col("node").alias("scc")
                )
                done.append(trivial)
                done_ids.append(f_ids)
                # shrink: survivors are a lazy filter over the flagged
                # checkpoint (no separate node materialization); edges
                # still re-checkpoint (every later pass/round re-reads
                # them). The old rem_n blocks are owned either by the
                # peel bookkeeping or by `done` — release only the
                # former.
                m = trivial.select("node")
                new_e, new_e_ids = _checkpoint_tracked(
                    rem_e.join(
                        m.select(F.col("node").alias("s")), "s", "left_anti"
                    ).join(
                        m.select(F.col("node").alias("d")), "d", "left_anti"
                    ),
                    sc,
                )
                _unpersist_ids(sc, rem_e_ids)
                _unpersist_ids(sc, rem_n_ids)
                rem_e, rem_e_ids = new_e, new_e_ids
                rem_n, rem_n_ids = (
                    flagged.where(~F.col("_t")).select("node"),
                    set(),  # blocks owned by done_ids now
                )
            if not rem_n.head(1):
                break

            # 2. FORWARD COLOR to fixpoint (min over ancestors + self).
            # Two r12 job-count cuts, both semantics-free: (a) rounds
            # run in 2-round spans before each materialization (each
            # round references the previous color plan twice, so
            # in-span lineage growth is bounded at 2 rounds — the
            # _cc_loop span discipline); (b) every round carries the
            # PRE-round color as `_mid`, so the convergence probe
            # ("the last round changed nothing" — exactly the old
            # per-round criterion, same round accounting) is a cached-
            # scan filter on the fresh checkpoint, not a shuffle join
            # of old vs new. Bowtie's 12-round coloring was ~84 of its
            # 179 per-rep jobs before this.
            colors, c_ids = _checkpoint_tracked(
                rem_n.select("node", F.col("node").alias("color")), sc
            )
            rounds_left = max_rounds
            converged = False
            while rounds_left > 0:
                span = min(2, rounds_left)
                rounds_left -= span
                plan = colors.select("node", "color")
                for _r in range(span):
                    incoming = (
                        rem_e.join(
                            plan.select(
                                F.col("node").alias("s"),
                                F.col("color").alias("c_in"),
                            ),
                            "s",
                        )
                        .groupBy(F.col("d").alias("node"))
                        .agg(F.min("c_in").alias("c_min"))
                    )
                    plan = plan.join(incoming, "node", "left").select(
                        "node",
                        F.least(
                            F.col("color"), F.coalesce("c_min", F.col("color"))
                        ).alias("color"),
                        F.col("color").alias("_mid"),
                    )
                new_c, new_c_ids = _checkpoint_tracked(plan, sc)
                changed = new_c.where(
                    F.col("color") != F.col("_mid")
                ).head(1)
                _unpersist_ids(sc, c_ids)
                colors, c_ids = new_c, new_c_ids
                if not changed:
                    converged = True
                    break
            if not converged:
                _unpersist_ids(sc, c_ids)
                raise RuntimeError(
                    f"scc: forward coloring did not converge in {max_rounds} rounds"
                )
            colors = colors.select("node", "color")

            # 3. BACKWARD SWEEP from the roots within same color
            member, m_ids = _checkpoint_tracked(
                colors.where(F.col("node") == F.col("color")).select(
                    "node", F.col("color").alias("scc")
                ),
                sc,
            )
            for _r in range(max_rounds):
                grown = (
                    rem_e.join(
                        member.select(F.col("node").alias("d"), "scc"), "d"
                    )
                    .select(F.col("s").alias("node"), "scc")
                    .join(
                        colors.select("node", F.col("color").alias("scc")),
                        ["node", "scc"],
                        "left_semi",
                    )
                    .join(member.select("node"), "node", "left_anti")
                    .distinct()
                )
                # r12 job-count cut: materialize member ∪ grown ONCE
                # with a `_new` marker — the growth probe reads the
                # fresh checkpoint (cached scan), and the grown rows
                # are already unioned in, so a growing round costs one
                # checkpoint instead of two. A no-growth final round
                # re-materializes member once — cheaper than the old
                # per-round extra checkpoint whenever the sweep grows
                # at least twice, and equal otherwise.
                combined, new_m_ids = _checkpoint_tracked(
                    member.select("node", "scc")
                    .withColumn("_new", F.lit(False))
                    .unionByName(grown.withColumn("_new", F.lit(True))),
                    sc,
                )
                grew = combined.where("_new").head(1)
                _unpersist_ids(sc, m_ids)
                member, m_ids = combined.select("node", "scc"), new_m_ids
                if not grew:
                    break
            else:
                _unpersist_ids(sc, c_ids)
                _unpersist_ids(sc, m_ids)
                raise RuntimeError(
                    f"scc: backward sweep did not converge in {max_rounds} rounds"
                )
            _unpersist_ids(sc, c_ids)
            done.append(member)
            done_ids.append(m_ids)
            _shrink(member)
        else:
            raise RuntimeError(f"scc: not settled after {max_peels} peels")

        from functools import reduce

        out = reduce(DataFrame.unionByName, done) if done else rem_n.limit(
            0
        ).select("node", F.col("node").alias("scc"))
        # one row per node: materialize, then every peel table is dead
        out_ck, _ = _checkpoint_tracked(out, sc)
        return out_ck
    finally:
        _unpersist_ids(sc, rem_e_ids)
        _unpersist_ids(sc, rem_n_ids)
        for ids in done_ids:
            _unpersist_ids(sc, ids)
