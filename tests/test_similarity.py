"""Learned-IVF quality contract: recall against the exact brute-force
baseline, and exactness when every cell is probed. (The registered query
embed_ivf_learned_topk is rows-only in the driver check — KMeans
centroids are Spark-internal — so this is where its answers are held to
a standard.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tvbigdataproject_spark.operators.similarity import cosine_topk, ivf_topk
from tvbigdataproject_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def truth(emb):
    qs = emb.where(F.col("vec_id") < 10)
    return {(r.q_vec_id, r.vec_id) for r in cosine_topk(emb, qs, k=5).collect()}


def test_ivf_recall_at_nprobe2(emb, truth):
    qs = emb.where(F.col("vec_id") < 10)
    got = {
        (r.q_vec_id, r.vec_id)
        for r in ivf_topk(emb, qs, k=5, nprobe=2, n_cells=8, ka=3).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall} < 0.9"


def test_ivf_full_probe_is_exact(emb, truth):
    # probing every cell degenerates to brute force: identical top-k
    # (same scores, same id tiebreak)
    qs = emb.where(F.col("vec_id") < 10)
    got = {
        (r.q_vec_id, r.vec_id)
        for r in ivf_topk(emb, qs, k=5, nprobe=8, n_cells=8, ka=1).collect()
    }
    assert got == truth


def test_ivf_multi_assignment_dedupes_pairs(emb):
    # a (query, candidate) pair sharing several probed cells must appear
    # exactly once, and ranks must be dense 1..k
    qs = emb.where(F.col("vec_id") < 3)
    out = ivf_topk(emb, qs, k=5, nprobe=3, n_cells=8, ka=3).collect()
    seen = [(r.q_vec_id, r.vec_id) for r in out]
    assert len(seen) == len(set(seen))
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_vec_id, []).append(r.rn)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_two_level_assignment_contract(emb):
    # the unified attach_nearest_cells (round-8 verdict item 5): the
    # leader-routed path must (a) emit well-formed nearest-first cell
    # lists, (b) be partitioning-invariant (routing is row-local), and
    # (c) agree with the flat sweep for MOST vectors (it is approximate
    # only at group boundaries).
    from tvbigdataproject_spark.operators.similarity import (
        attach_nearest_cells,
        fit_ivf_centers,
    )

    centers = fit_ivf_centers(emb, n_cells=16, cache_key=("t2l", SF_DIR))
    flat = attach_nearest_cells(
        emb, centers, 2, out_col="cells", two_level=False
    )
    routed = attach_nearest_cells(
        emb, centers, 2, out_col="cells", two_level=True
    )
    f = {r.vec_id: list(r.cells) for r in flat.collect()}
    g = {r.vec_id: list(r.cells) for r in routed.collect()}
    assert set(f) == set(g)
    for cells in g.values():
        assert len(cells) == 2 and len(set(cells)) == 2
        assert all(0 <= c < 16 for c in cells)
    # nearest-cell agreement on the near-uniform synthetic sphere (the
    # WORST case for any geometric routing — cells are arbitrary here,
    # cf. the no-cosine-signal label finding in SCALE.md) still has to
    # clear a floor; the production-regime bar is the clustered-data
    # test below
    agree = sum(1 for k in f if f[k][0] == g[k][0]) / len(f)
    assert agree >= 0.6, f"nearest-cell agreement {agree}"
    shuf = {
        r.vec_id: list(r.cells)
        for r in attach_nearest_cells(
            emb.repartition(7), centers, 2, out_col="cells", two_level=True
        ).collect()
    }
    assert shuf == g


def test_two_level_agreement_high_on_clustered_data(spark):
    # the production regime (mirrors test_clustering's multiprobe bar):
    # on 10 tight Gaussian bundles the nearest-leader routing finds the
    # flat sweep's argmin cell almost always — geometric coherence is
    # exactly what routing exploits
    import numpy as np

    from tvbigdataproject_spark.operators.similarity import (
        attach_nearest_cells,
        fit_ivf_centers,
    )

    rng = np.random.default_rng(7)
    bundles = rng.normal(size=(10, 64))
    bundles /= np.linalg.norm(bundles, axis=1, keepdims=True)
    X = np.repeat(bundles, 40, axis=0) + rng.normal(
        scale=0.15, size=(400, 64)
    )
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<float>",
    )
    centers = fit_ivf_centers(emb, n_cells=16)
    f = {
        r.vec_id: r.cells[0]
        for r in attach_nearest_cells(
            emb, centers, 1, two_level=False
        ).collect()
    }
    g = {
        r.vec_id: r.cells[0]
        for r in attach_nearest_cells(
            emb, centers, 1, two_level=True
        ).collect()
    }
    # measured 0.90 at k=16 (gs=4 -> only 4 leaders; top-2 routing
    # covers half the centroids — the coarsest regime the routing path
    # ever runs at, since the crossover only engages it at k >= 128
    # where sqrt(k) leaders are far finer)
    agree = sum(1 for k in f if f[k] == g[k]) / len(f)
    assert agree >= 0.85, f"clustered nearest-cell agreement {agree}"


def test_ivf_recall_survives_two_level_routing(emb, truth):
    # force the scale path (routing on below the crossover) and hold it
    # to the FLAT path's recall at identical params: routing is allowed
    # to cost a little recall at group boundaries, never a regime. The
    # absolute numbers are low for BOTH at n_cells=16/nprobe=2 on this
    # near-uniform corpus (flat 0.68, two-level 0.66 measured) — the
    # corpus has no cluster structure to exploit; the relative contract
    # is the meaningful one.
    qs = emb.where(F.col("vec_id") < 10)
    from tvbigdataproject_spark.operators import similarity as S

    exact = {
        (r.q_vec_id, r.vec_id) for r in cosine_topk(emb, qs, k=5).collect()
    }

    def run():
        got = {
            (r.q_vec_id, r.vec_id)
            for r in ivf_topk(
                emb, qs, k=5, nprobe=2, n_cells=16, ka=3
            ).collect()
        }
        return len(got & exact) / len(exact)

    orig = S._TWO_LEVEL_K
    try:
        S._TWO_LEVEL_K = 10**9  # flat everywhere
        flat = run()
        S._TWO_LEVEL_K = 1  # route everything two-level
        routed = run()
    finally:
        S._TWO_LEVEL_K = orig
    assert routed >= flat - 0.1, f"two-level {routed} vs flat {flat}"


def test_arrow_kernel_bitwise_equals_hof(emb):
    # the two scoring kernels must agree bit-for-bit (not approximately):
    # the DuckDB oracles spell out a sequential left-to-right float64
    # fold, the HOF aggregate() implements it, and cosine_arrow's
    # outer-axis numpy reduction must reproduce it exactly — any ulp
    # drift would flip rank order on near-ties and break hash parity
    from tvbigdataproject_spark.functions import cosine_arrow, cosine_similarity

    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    pairs = a.where(F.col("ia") < 40).crossJoin(b.where(F.col("ib") < 40))
    mismatched = (
        pairs.select(
            cosine_similarity(F.col("ea"), F.col("eb")).alias("hof"),
            cosine_arrow(F.col("ea"), F.col("eb")).alias("arrow"),
        )
        .where(~F.col("hof").eqNullSafe(F.col("arrow")))
        .count()
    )
    assert mismatched == 0


def test_kernels_give_identical_topk(emb):
    qs = emb.where(F.col("vec_id") < 10)
    arrow = {
        (r.q_vec_id, r.vec_id, r.cos, r.rn)
        for r in cosine_topk(emb, qs, k=5, kernel="arrow").collect()
    }
    hof = {
        (r.q_vec_id, r.vec_id, r.cos, r.rn)
        for r in cosine_topk(emb, qs, k=5, kernel="hof").collect()
    }
    assert arrow == hof


def test_arrow_kernel_exact_on_single_row_batches(emb):
    # regression: a (dim, 1) batch makes the reduced axis contiguous and
    # numpy's own reductions silently switch to pairwise summation —
    # one-row Arrow batches must still match the sequential fold
    from tvbigdataproject_spark.functions import cosine_arrow, cosine_similarity

    a = emb.where(F.col("vec_id") == 21).select(F.col("embedding").alias("ea"))
    b = emb.where(F.col("vec_id") == 24).select(F.col("embedding").alias("eb"))
    r = (
        a.crossJoin(b)
        .select(
            cosine_similarity(F.col("ea"), F.col("eb")).alias("hof"),
            cosine_arrow(F.col("ea"), F.col("eb")).alias("arrow"),
        )
        .collect()[0]
    )
    assert r.hof == r.arrow


def test_embed_covariance_partials_partition_invariant(spark):
    # the int64 Gram partials must be exactly associative: any
    # repartitioning yields bit-identical sums (this is what makes the
    # mapInPandas kernel safe at any parallelism)
    from tvbigdataproject_spark.queries.embeddings3 import (
        embed_covariance_pairs,
    )

    base = embed_covariance_pairs(spark, "/root/testdata/sf0.001")
    rows1 = {tuple(r) for r in base.collect()}
    # force a different partitioning of the source by re-running with a
    # different shuffle setting on a repartitioned read
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    try:
        rows2 = {
            tuple(r)
            for r in embed_covariance_pairs(
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
    assert rows1 == rows2
