"""Brandes betweenness: exactness vs a pure-Python reference on hand
graphs, determinism (bitwise-stable scaled integers), and the
registered query's structural invariants."""

from __future__ import annotations

from collections import deque

from pyspark.sql import functions as F

from tvbigdataproject_spark.operators.centrality import (
    _BC_SCALE,
    brandes_betweenness,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_brandes(adj, sources, max_hops):
    """Textbook Brandes (directed sweep from each source), exact
    rationals via float (tiny graphs only)."""
    bc = {v: 0.0 for v in adj}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            if dist[v] == max_hops:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in adj[w]:
                # predecessors of w are neighbors one level closer
                if dist.get(v, -2) == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def _edges_df(spark, pairs):
    bi = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(bi, "src long, dst long")


def _run(spark, pairs, sources, max_hops):
    e = _edges_df(spark, pairs)
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    got = {
        r.node: r.betweenness
        for r in brandes_betweenness(e, s, max_hops=max_hops).collect()
    }
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = _py_brandes(adj, sources, max_hops)
    return got, want


def test_path_graph_all_sources_is_exact_brandes(spark):
    # path 0-1-2-3: betweenness (all-sources directed sweep) of the
    # middle nodes dominates; ends are 0
    pairs = [(0, 1), (1, 2), (2, 3)]
    got, want = _run(spark, pairs, [0, 1, 2, 3], max_hops=3)
    for v, w in want.items():
        assert abs(got.get(v, 0.0) - w) < 1e-6, (v, got.get(v), w)


def test_diamond_graph_splits_path_counts(spark):
    # 0-1-3, 0-2-3 diamond: two shortest 0->3 paths, sigma split 50/50
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3)]
    got, want = _run(spark, pairs, [0, 1, 2, 3], max_hops=2)
    for v, w in want.items():
        assert abs(got.get(v, 0.0) - w) < 1e-6, (v, got.get(v), w)
    # the split is visible: each middle node carries 0.5 per direction
    assert abs(got[1] - got[2]) < 1e-9


def test_hop_cap_limits_dependency(spark):
    # path 0-1-2-3 from source 0 with max_hops=2: node 3 unreached, so
    # node 2 accrues nothing from beyond and only 1 lies on 0->2 paths
    pairs = [(0, 1), (1, 2), (2, 3)]
    got, want = _run(spark, pairs, [0], max_hops=2)
    for v, w in want.items():
        assert abs(got.get(v, 0.0) - w) < 1e-6, (v, got.get(v), w)


def test_scaled_integers_are_bitwise_stable_across_runs(spark):
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (1, 4)]
    e = _edges_df(spark, pairs)
    s = spark.createDataFrame([(0,), (1,)], "node long")
    a = sorted(
        (r.node, r.bc_scaled)
        for r in brandes_betweenness(e, s, max_hops=4).collect()
    )
    b = sorted(
        (r.node, r.bc_scaled)
        for r in brandes_betweenness(
            e.repartition(7), s, max_hops=4
        ).collect()
    )
    assert a == b


def test_registered_query_sources_accrue_nothing(spark):
    from tvbigdataproject_spark.queries.graph6 import betweenness_landmarks

    out = betweenness_landmarks(spark, SF_DIR)
    rows = out.collect()
    assert len(rows) > 0
    # landmarks are customers 1..3 (lowest ids); they appear only if
    # they lie on OTHER landmarks' shortest paths — their own sweep
    # excludes them, and nothing may be negative
    assert all(r.bc_scaled >= 0 for r in rows)
    # scaled integer and float agree
    for r in rows[:50]:
        assert abs(r.betweenness - r.bc_scaled / _BC_SCALE) < 1e-9


def test_hop_budget_larger_than_graph_early_exits_and_stays_exact(spark):
    # path 0-1-2 with max_hops=10: the forward sweep's frontier empties
    # at hop 2 — the span-boundary convergence check must stop there
    # (no empty re-checkpoint rounds) and the backward descent must
    # start at the deepest REACHED level, with values still exact
    pairs = [(0, 1), (1, 2)]
    got, want = _run(spark, pairs, [0, 1, 2], max_hops=10)
    for v, w in want.items():
        assert abs(got.get(v, 0.0) - w) < 1e-6, (v, got.get(v), w)


def test_isolated_sources_yield_empty_result(spark):
    # sources with no outgoing edges reach nothing: deepest hop is 0,
    # the zero-depth backward guard returns an empty typed frame
    e = spark.createDataFrame([(10, 11)], "src long, dst long")
    s = spark.createDataFrame([(99,)], "node long")
    out = brandes_betweenness(e, s, max_hops=5)
    assert out.columns == ["node", "bc_scaled", "betweenness"]
    assert out.count() == 0


def test_dense_graph_promotes_to_decimal_and_stays_exact(spark):
    """Layered dense DAG whose path counts provably overflow the BIGINT
    backward numerator: 7 fully-connected 64-wide layers give sigma =
    64^6 ~ 6.9e10 at the last layer, so sigma * 2^30 ~ 7.4e19 > 2^63.
    Without the automatic DECIMAL(38,0) promotion the ANSI multiply
    raises ArithmeticException; with it the sweep completes and the
    scaled integers match the exact unbounded-int Python recursion."""
    width, depth = 64, 7
    node = lambda h, j: h * 1000 + j  # noqa: E731
    edges = [(0, node(1, j)) for j in range(width)]
    for h in range(1, depth):
        edges += [
            (node(h, i), node(h + 1, j))
            for i in range(width)
            for j in range(width)
        ]
    sink = 999_999
    edges += [(node(depth, i), sink) for i in range(width)]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(0,)], "node long")

    got = {
        r.node: r.bc_scaled
        for r in brandes_betweenness(e, s, max_hops=depth + 1).collect()
    }

    # exact integer replay of the scaled recursion, layer-symmetric:
    # sigma(h) = width^(h-1); all nodes of a layer share one delta.
    S = _BC_SCALE
    sigma = {h: width ** (h - 1) for h in range(1, depth + 1)}
    sigma[depth + 1] = width ** depth  # sink
    delta = {depth + 1: 0}
    for h in range(depth, 0, -1):
        if h == depth:
            # one successor: the sink
            delta[h] = sigma[h] * (S + delta[h + 1]) // sigma[h + 1]
        else:
            delta[h] = width * (
                sigma[h] * (S + delta[h + 1]) // sigma[h + 1]
            )
    # sanity: the BIGINT numerator really would overflow at depth
    assert sigma[depth] * (S + delta[depth + 1]) >= (1 << 63)
    assert sink not in got or got[sink] == 0  # sink has no successors
    for h in range(1, depth + 1):
        for j in (0, width - 1):
            assert got[node(h, j)] == delta[h], (h, got[node(h, j)], delta[h])
