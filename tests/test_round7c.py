"""Round-7c additions: CUSUM changepoint and double-sweep diameter —
value semantics pinned against pure-Python models on sf0.001."""

from __future__ import annotations

from collections import defaultdict, deque

import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def test_cusum_changepoint_matches_python(spark):
    from tvbigdataproject_spark.queries.registry import REGISTRY

    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_type", "ts"])
    days = defaultdict(lambda: defaultdict(int))
    for et, ts in zip(t.column("event_type").to_pylist(), t.column("ts").to_pylist()):
        days[et][ts.date()] += 1
    want = {}
    for et, dd in days.items():
        series = sorted(dd.items())
        n, total = len(series), sum(c for _, c in series)
        cum, best = 0, None
        for t_idx, (day, cnt) in enumerate(series, start=1):
            cum += cnt
            dev = n * cum - t_idx * total
            key = (-abs(dev), day)
            if best is None or key < best[0]:
                best = (key, day, abs(dev), 1 if dev > 0 else (-1 if dev < 0 else 0))
        want[et] = (best[1], n, total, best[2], best[3])

    got = {
        r.event_type: (r.cp_day, r.n_days, r.total_events, r.cusum_dev, r.dev_sign)
        for r in REGISTRY["cusum_changepoint"].fn(spark, SF_DIR).collect()
    }
    assert got == want


def test_graph_diameter_sweep_matches_python(spark):
    from tvbigdataproject_spark.queries.registry import REGISTRY

    li = pq.read_table(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])
    od = pq.read_table(f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = dict(zip(od.column("o_orderkey").to_pylist(), od.column("o_custkey").to_pylist()))
    edges = set()
    for ok, sk in zip(li.column("l_orderkey").to_pylist(), li.column("l_suppkey").to_pylist()):
        if ok in cust:
            edges.add((cust[ok], -sk))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)

    def bfs(start, cap):
        dist = {start: 0}
        q = deque([start])
        while q:
            u = q.popleft()
            if dist[u] == cap:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist

    seed = min(adj, key=lambda n: (-len(adj[n]), n))
    d1 = bfs(seed, 4)
    far = min(d1, key=lambda n: (-d1[n], n))
    d2 = bfs(far, 4)
    ecc = max(d2.values())
    at = [n for n, h in d2.items() if h == ecc]

    row = REGISTRY["graph_diameter_sweep"].fn(spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (r.seed_node, r.sweep1_far, r.ecc_lb, r.far2_node, r.n_at_ecc) == (
        seed, far, ecc, min(at), len(at),
    )
