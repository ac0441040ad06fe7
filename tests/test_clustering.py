"""Integer-exact Lloyd k-means: bitwise equality vs a pure-Python
model, partitioning invariance, and the empty-cell carry rule."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tvbigdataproject_spark.operators.clustering import (
    QUANT_SCALE,
    kmeans_lloyd,
    quantize_vectors,
)

SF_DIR = "/root/testdata/sf0.001"


def _quant(v: np.ndarray) -> np.ndarray:
    # HALF_UP (away from zero), matching Spark round() and DuckDB round()
    x = v.astype(np.float64) * QUANT_SCALE
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _py_kmeans(ids, vecs, k, iters):
    """Reference Lloyd in exact int space: md5 seeds, (dist, cell)
    tie-break, floor(sum/n) update, empty-cell carry."""
    q = {i: _quant(v) for i, v in zip(ids, vecs)}
    seed_ids = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k]
    cents = {c: q[i].copy() for c, i in enumerate(seed_ids)}

    def assign():
        out = {}
        for i in ids:
            best = min(
                (int(((q[i] - cv) ** 2).sum()), c) for c, cv in cents.items()
            )
            out[i] = best  # (dist, cell)
        return out

    for _ in range(iters):
        a = assign()
        for c in list(cents):
            members = [q[i] for i, (_, ci) in a.items() if ci == c]
            if members:
                s = np.sum(members, axis=0, dtype=np.int64)
                cents[c] = np.floor(
                    s.astype(np.float64) / len(members)
                ).astype(np.int64)
    return {i: (c, d) for i, (d, c) in assign().items()}


def test_kmeans_matches_python_model_bitwise(spark):
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    want = _py_kmeans(ids, vecs, k=8, iters=2)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {
        r.vec_id: (r.cell, r.dist_q)
        for r in kmeans_lloyd(emb, k=8, iters=2, dim=64).collect()
    }
    assert got == want


def test_kmeans_partitioning_invariant(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = sorted(
        map(tuple, kmeans_lloyd(emb, k=8, iters=2, dim=64).collect())
    )
    shuffled = sorted(
        map(
            tuple,
            kmeans_lloyd(emb.repartition(7), k=8, iters=2, dim=64).collect(),
        )
    )
    assert base == shuffled


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    # md5 seed order for ids {1,2,3} is [1, 2], and v1 == v2, so both
    # seed centroids are identical: round 1 assigns EVERY point to the
    # lower cell (tie-break), cell 1 goes empty and must carry (0,0);
    # round 2 then wins points 1,2 BACK to cell 1 (their distance to
    # the carried centroid is 0 < distance to cell 0's moved mean) —
    # the carry visibly changes the result, and the Python model
    # implements the same rule, so bitwise equality proves it
    rows = [
        (1, [0.0, 0.0]),
        (2, [0.0, 0.0]),
        (3, [0.5, 0.5]),
    ]
    ids = [r[0] for r in rows]
    vecs = np.array([r[1] for r in rows], dtype=np.float32)
    want = _py_kmeans(ids, vecs, k=2, iters=2)

    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: (r.cell, r.dist_q)
        for r in kmeans_lloyd(df, k=2, iters=2, dim=2).collect()
    }
    assert got == want
    # the carried cell is genuinely used in the final assignment
    assert {c for c, _ in got.values()} == {0, 1}


def test_quantize_is_scan_local_and_exact(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.5, 0.25])], "vec_id long, embedding array<float>"
    )
    q = quantize_vectors(df).select("qv").first().qv
    assert q == [QUANT_SCALE // 2, -(QUANT_SCALE // 2), QUANT_SCALE // 4]
    plan = quantize_vectors(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------- DBSCAN


def _py_dbscan(ids, labels, vecs, threshold, min_pts):
    """Reference DBSCAN on the same-cell cosine relation, all floats as
    sequential left folds (the engine-portable order)."""
    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    import math

    by_cell = {}
    for i, lb in zip(ids, labels):
        by_cell.setdefault(lb, []).append(i)
    vec = dict(zip(ids, vecs))
    nbrs = {i: set() for i in ids}
    for cell, members in by_cell.items():
        ms = sorted(members)
        for xi in range(len(ms)):
            for yi in range(xi + 1, len(ms)):
                a, b = ms[xi], ms[yi]
                cos = fold_dot(vec[a], vec[b]) / (
                    math.sqrt(fold_dot(vec[a], vec[a]))
                    * math.sqrt(fold_dot(vec[b], vec[b]))
                )
                if cos >= threshold:
                    nbrs[a].add(b)
                    nbrs[b].add(a)
    # inclusive neighborhood (sklearn min_samples): the point counts itself
    core = {i for i in ids if len(nbrs[i]) + 1 >= min_pts}
    # union-find over core-core edges
    parent = {i: i for i in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in core:
        for b in nbrs[a]:
            if b in core:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    cluster = {i: min(j for j in core if find(j) == find(i)) for i in core}
    out = {}
    for i in ids:
        if i in core:
            out[i] = ("core", cluster[i])
        else:
            cands = [cluster[j] for j in nbrs[i] if j in core]
            out[i] = ("border", min(cands)) if cands else ("noise", None)
    return out


def test_dbscan_matches_python_model(spark):
    import pyarrow.parquet as pq

    from tvbigdataproject_spark.operators.clustering import dbscan_cosine

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    labels = t.column("label").to_pylist()
    vecs = t.column("embedding").to_pylist()
    want = _py_dbscan(ids, labels, vecs, threshold=0.2, min_pts=4)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {
        r.vec_id: (r.role, r.cluster)
        for r in dbscan_cosine(emb, threshold=0.2, min_pts=4).collect()
    }
    assert got == want
    roles = [v[0] for v in got.values()]
    # the parameter choice must exercise all three roles
    assert {"core", "border", "noise"} <= set(roles) or len(ids) < 60


def test_dbscan_partitioning_invariance(spark):
    from tvbigdataproject_spark.operators.clustering import dbscan_cosine

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = sorted(
        map(tuple, dbscan_cosine(emb, threshold=0.2, min_pts=4).collect())
    )
    shuf = sorted(
        map(
            tuple,
            dbscan_cosine(
                emb.repartition(7), threshold=0.2, min_pts=4
            ).collect(),
        )
    )
    assert base == shuf
