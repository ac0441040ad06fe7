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
