"""Similarity search over the embeddings table (north-star surface):
brute-force cosine top-k, IVF-style partition-pruned top-k, and
cosine near-duplicate pairs.

Vector math is zip_with/aggregate over array<double> (functions/vectors)
— JVM-side, no Python. The brute-force path broadcasts the (small) query
set against the candidate corpus: at 100 TB the corpus side stays
partitioned and the per-partition work is a dense dot-product sweep,
which is the correct baseline. The IVF variant prunes candidates to the
query's coarse cell (here: the `label` column as the cell assignment) —
the same plan shape as a real IVF index where the cell id comes from a
centroid assignment pass.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.functions import cosine_similarity
from tvbigdataproject_spark.operators.similarity import (
    cell_pruned_topk,
    cosine_neardup_pairs,
    cosine_topk,
    ivf_topk,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# Explicit per-index dot product so the oracle's floating-point sum order
# (left-to-right over 64 terms) matches Spark's aggregate() left fold
# bit-for-bit; results are additionally rounded.
_DIM = 64
_DOT = " + ".join(
    f"a.embedding[{i}]::DOUBLE * b.embedding[{i}]::DOUBLE" for i in range(1, _DIM + 1)
)
_NORM_A = "sqrt(" + " + ".join(
    f"a.embedding[{i}]::DOUBLE * a.embedding[{i}]::DOUBLE" for i in range(1, _DIM + 1)
) + ")"
_NORM_B = "sqrt(" + " + ".join(
    f"b.embedding[{i}]::DOUBLE * b.embedding[{i}]::DOUBLE" for i in range(1, _DIM + 1)
) + ")"


@query(
    "embed_norms",
    sql="""
    SELECT vec_id, label,
           len(embedding) AS dim,
           sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum'))
               AS l2_norm
    FROM embeddings
    """,
    tags=("embeddings",),
)
def embed_norms(spark, sf_dir):
    """Vector length + L2 norm — the sanity primitive for the vector lib."""
    from tvbigdataproject_spark.functions import l2_norm

    emb = read_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        l2_norm(F.col("embedding")).alias("l2_norm"),
    )


@query(
    "embed_cosine_topk",
    sql=f"""
    SELECT q_vec_id, vec_id, cos, rn FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS vec_id,
               ({_DOT}) / ({_NORM_A} * {_NORM_B}) AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY ({_DOT}) / ({_NORM_A} * {_NORM_B}) DESC, b.vec_id
               ) AS rn
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 10
    ) WHERE rn <= 5
    """,
    tags=("embeddings", "ann"),
)
def embed_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 for 10 query vectors — the exact baseline
    every ANN variant is measured against.

    The query set is broadcast; the corpus side streams partition-local.
    Ranking is on the rounded score with vec_id tiebreak so top-k is
    deterministic.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


@query(
    "embed_ivf_topk",
    sql=f"""
    SELECT q_vec_id, vec_id, cos, rn FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS vec_id,
               ({_DOT}) / ({_NORM_A} * {_NORM_B}) AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY ({_DOT}) / ({_NORM_A} * {_NORM_B}) DESC, b.vec_id
               ) AS rn
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id <> b.vec_id
        WHERE a.vec_id < 10
    ) WHERE rn <= 3
    """,
    tags=("embeddings", "ann"),
)
def embed_ivf_topk(spark, sf_dir):
    """IVF-style pruned top-3: candidates restricted to the query's coarse
    cell (label). Equi-join on the cell id replaces the cross join — this
    is the scale path: cells partition the corpus, each query probes one
    (or nprobe) cells."""
    emb = read_table(spark, sf_dir, "embeddings")
    return cell_pruned_topk(emb, emb.where(F.col("vec_id") < 10), k=3)


@query("embed_ivf_learned_topk", sql=None, tags=("embeddings", "ann", "ivf"))
def embed_ivf_learned_topk(spark, sf_dir):
    """Learned-IVF top-5 for 10 query vectors: seeded KMeans coarse
    quantizer (no precomputed label needed — works on unlabeled
    corpora), corpus-side multi-assignment ka=3, query-side nprobe=2.

    Rows-only driver check: the KMeans centroids are Spark-internal
    (seeded, deterministic within Spark) and no other engine can replay
    them; recall ≥ 0.9 vs the oracle-checked brute-force baseline is
    asserted in tests/test_similarity.py.

    The centroids are memoized per (sf_dir, params): repeated calls — a
    bench loop, a session serving many queries — pay the KMeans fit
    once, like any amortized index build.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, emb.where(F.col("vec_id") < 10), k=5, nprobe=2, n_cells=8, ka=3,
        cache_key=("embeddings", sf_dir),
    )


@query(
    "embed_neardup_pairs",
    sql=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ({_DOT}) / ({_NORM_A} * {_NORM_B}) AS cos
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ({_DOT}) / ({_NORM_A} * {_NORM_B}) >= 0.3
    """,
    tags=("embeddings", "dedup"),
)
def embed_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, blocked by the coarse cell
    so the pair space is per-cell, not global — the embedding-space
    analogue of LSH-bucketed dedup. Threshold 0.3 because the synthetic
    embeddings carry no tighter duplicates (label clusters sit at ~0.3);
    production near-dup runs use ≥0.95."""
    return cosine_neardup_pairs(
        read_table(spark, sf_dir, "embeddings"), threshold=0.3
    )


@query(
    "embed_quantize_int8",
    sql="""
    WITH s AS (
        SELECT vec_id, embedding::DOUBLE[] AS e,
               list_aggregate(list_transform(embedding::DOUBLE[], x -> abs(x)), 'max')
                   / 127.0 AS scale
        FROM embeddings
    )
    SELECT vec_id, scale,
           CAST(list_aggregate(list_transform(e, x -> CAST(round(x / scale) AS BIGINT)),
                               'sum') AS BIGINT) AS q_sum,
           sqrt(list_aggregate(list_transform(e, x -> (x - round(x / scale) * scale)
                                                      * (x - round(x / scale) * scale)),
                               'sum')) AS recon_err
    FROM s
    """,
    tags=("embeddings", "quantize"),
)
def embed_quantize_int8(spark, sf_dir):
    """Symmetric int8 vector quantization — the storage lever that turns
    a 100 TB float32 embedding store into 25 TB: per-vector scale =
    max|x|/127, quantized component q = round(x/scale). Output carries
    the scale, the (exact, integer) sum of quantized components, and the
    L2 reconstruction error per vector.

    The scale factor is computed in its own projection so it is
    evaluated once per row, not once per element inside the lambdas
    (HOF lambdas re-evaluate referenced subtrees per element). All math
    is IEEE double in both engines and the error sum is the same
    left-fold as l2_norm, so the oracle matches bitwise.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    scaled = emb.select(
        "vec_id",
        e.alias("e"),
        (F.array_max(F.transform(e, lambda x: F.abs(x))) / 127.0).alias("scale"),
    )
    scale = F.col("scale")
    q = lambda x: F.round(x / scale)  # noqa: E731
    return scaled.select(
        "vec_id",
        "scale",
        F.aggregate(
            F.col("e"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + q(x).cast("long"),
        ).alias("q_sum"),
        F.sqrt(
            F.aggregate(
                F.col("e"),
                F.lit(0.0),
                lambda acc, x: acc + (x - q(x) * scale) * (x - q(x) * scale),
            )
        ).alias("recon_err"),
    )


def _dot_of(x: str, y: str) -> str:
    return " + ".join(
        f"{x}.embedding[{i}]::DOUBLE * {y}.embedding[{i}]::DOUBLE"
        for i in range(1, _DIM + 1)
    )


def _norm_of(x: str) -> str:
    return "sqrt(" + " + ".join(
        f"{x}.embedding[{i}]::DOUBLE * {x}.embedding[{i}]::DOUBLE"
        for i in range(1, _DIM + 1)
    ) + ")"


_MMR_LAMBDA = "0.5"  # exactly-representable tradeoff weight
_MMR_POOL = 20


def _mmr_sql() -> str:
    cos_qb = f"({_dot_of('q', 'b')}) / ({_norm_of('q')} * {_norm_of('b')})"

    def cos(p: str, s: str) -> str:
        return f"(({_dot_of(p, s)}) / ({_norm_of(p)} * {_norm_of(s)}))"

    return f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    scored AS (
        SELECT b.vec_id, b.embedding, {cos_qb} AS rel
        FROM embeddings b CROSS JOIN q WHERE b.vec_id <> 0
    ),
    pool AS (
        SELECT vec_id, embedding, rel FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY rel DESC, vec_id) AS rn
            FROM scored
        ) WHERE rn <= {_MMR_POOL}
    ),
    m1 AS (
        SELECT vec_id, embedding, rel AS mmr FROM pool
        ORDER BY rel DESC, vec_id LIMIT 1
    ),
    p2 AS (
        SELECT p.vec_id, p.embedding,
               p.rel - {_MMR_LAMBDA} * {cos('p', 's')} AS mmr
        FROM pool p CROSS JOIN m1 s WHERE p.vec_id <> s.vec_id
    ),
    m2 AS (SELECT vec_id, embedding, mmr FROM p2 ORDER BY mmr DESC, vec_id LIMIT 1),
    p3 AS (
        SELECT p.vec_id, p.embedding,
               p.rel - {_MMR_LAMBDA} *
                   GREATEST({cos('p', 's1')}, {cos('p', 's2')}) AS mmr
        FROM pool p CROSS JOIN m1 s1 CROSS JOIN m2 s2
        WHERE p.vec_id <> s1.vec_id AND p.vec_id <> s2.vec_id
    ),
    m3 AS (SELECT vec_id, embedding, mmr FROM p3 ORDER BY mmr DESC, vec_id LIMIT 1)
    SELECT CAST(1 AS INT) AS sel_round, vec_id, mmr FROM m1
    UNION ALL SELECT CAST(2 AS INT), vec_id, mmr FROM m2
    UNION ALL SELECT CAST(3 AS INT), vec_id, mmr FROM m3
    """


@query(
    "mmr_diverse_topk",
    sql=_mmr_sql(),
    tags=("embeddings", "ann", "mmr", "diversity"),
)
def mmr_diverse_topk(spark, sf_dir):
    """Maximal Marginal Relevance: select 3 results for query vector 0
    that balance relevance against redundancy — each round picks
    argmax of rel(d) - 0.5 * max_{s in selected} cos(d, s). The
    diversity-aware re-ranking step retrieval pipelines run after ANN,
    and a second iterative-argmax operator family beside BPE (select
    one, update the objective, repeat).

    Exactness: relevance and penalty cosines use the left-fold dot
    (functions/vectors.py contract) that the oracle unrolls
    term-by-term; the 0.5 weight is dyadic; the round-2/3 penalties
    replay as CROSS JOINs against the one-row selections with the
    identical GREATEST/max semantics — the whole greedy trajectory is
    value-checked, so a single mis-ranked candidate in any round fails
    the gate.

    Scale shape: one corpus sweep scores relevance (broadcast
    one-vector query), a TakeOrdered keeps the 20-candidate pool, and
    each selection round runs on the bounded pool with one-row
    broadcast attaches — at 100 TB the sweep is the only data-scale
    stage, exactly like the production ANN-then-rerank split.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    pool = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))  # one-row query vector
        .select(
            "vec_id",
            "embedding",
            cosine_similarity(F.col("embedding"), F.col("q_emb")).alias("rel"),
        )
        .orderBy(F.desc("rel"), "vec_id")
        .limit(_MMR_POOL)
    )
    lam = 0.5
    selected = pool.orderBy(F.desc("rel"), "vec_id").limit(1).select(
        F.lit(1).cast("int").alias("sel_round"),
        "vec_id",
        "embedding",
        F.col("rel").alias("mmr"),
    )
    out = selected
    for r in (2, 3):
        sel_vecs = F.broadcast(
            out.select(
                F.col("vec_id").alias("s_id"),
                F.col("embedding").alias("s_emb"),
            )
        )
        pen = (
            pool.join(out.select(F.col("vec_id").alias("s_id")), pool.vec_id == F.col("s_id"), "left_anti")
            .crossJoin(sel_vecs)
            .select(
                "vec_id",
                cosine_similarity(F.col("embedding"), F.col("s_emb")).alias("sim"),
            )
            .groupBy("vec_id")
            .agg(F.max("sim").alias("max_sim"))
        )
        cand = pool.join(F.broadcast(pen), "vec_id").select(
            "vec_id",
            "embedding",
            (F.col("rel") - lam * F.col("max_sim")).alias("mmr"),
        )
        pick = cand.orderBy(F.desc("mmr"), "vec_id").limit(1).select(
            F.lit(r).cast("int").alias("sel_round"), "vec_id", "embedding", "mmr"
        )
        out = out.unionByName(pick)
    return out.select("sel_round", "vec_id", "mmr")


def _qdot_sql() -> str:
    return " + ".join(
        f"CAST(round(a.embedding[{i}]::DOUBLE / a.scale) AS BIGINT)"
        f" * CAST(round(b.embedding[{i}]::DOUBLE / b.scale) AS BIGINT)"
        for i in range(1, _DIM + 1)
    )


@query(
    "quantize_recall_topk",
    sql=f"""
    WITH s AS (
        SELECT vec_id, embedding,
               list_aggregate(list_transform(embedding::DOUBLE[],
                                             x -> abs(x)), 'max') / 127.0
                   AS scale
        FROM embeddings
    ),
    exact AS (
        SELECT q, c FROM (
            SELECT a.vec_id AS q, b.vec_id AS c,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY ({_DOT}) / ({_NORM_A} * {_NORM_B}) DESC,
                                b.vec_id
                   ) AS rn
            FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
            WHERE a.vec_id < 5
        ) WHERE rn <= 10
    ),
    quant AS (
        SELECT q, c FROM (
            SELECT a.vec_id AS q, b.vec_id AS c,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY ({_qdot_sql()}) DESC, b.vec_id
                   ) AS rn
            FROM s a JOIN s b ON a.vec_id <> b.vec_id
            WHERE a.vec_id < 5
        ) WHERE rn <= 10
    )
    SELECT e.q AS q_vec_id, COUNT(qt.c) AS recall10_hits
    FROM exact e LEFT JOIN quant qt ON e.q = qt.q AND e.c = qt.c
    GROUP BY e.q
    """,
    tags=("embeddings", "quantize", "recall"),
)
def quantize_recall_topk(spark, sf_dir):
    """Recall@10 of int8-quantized integer-dot retrieval against exact
    cosine, for 5 query vectors — the accuracy side of the 4x storage
    win embed_quantize_int8 prices out. The quantized ranking uses a
    PURE INTEGER dot product of the per-vector-scaled int8 codes
    (order-free, no float accumulation at all), so both rankings and
    hence the overlap counts are engine-exact; a LEFT join keeps
    queries with zero overlap visible.

    Scale shape: both rankings are broadcast-query-set sweeps over the
    corpus with per-query TakeOrdered windows; at 100 TB the quantized
    sweep is the one you run (4x less memory bandwidth), and this
    query IS the offline gate that says the recall cost of doing so.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    s = emb.select(
        "vec_id",
        e.alias("e"),
        (F.array_max(F.transform(e, lambda x: F.abs(x))) / 127.0).alias("scale"),
    ).select(
        "vec_id",
        F.transform(
            F.col("e"), lambda x: F.round(x / F.col("scale")).cast("long")
        ).alias("q8"),
    )
    probes = s.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q"), F.col("q8").alias("qa")
    )
    qpairs = probes.join(
        s.select(F.col("vec_id").alias("c"), F.col("q8").alias("qb")),
        F.col("q") != F.col("c"),
    ).select(
        "q",
        "c",
        F.aggregate(
            F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("qdot"),
    )
    wq = Window.partitionBy("q").orderBy(F.desc("qdot"), "c")
    quant = qpairs.select(
        "q", "c", F.row_number().over(wq).alias("rn")
    ).where(F.col("rn") <= 10)

    probes_f = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q"), F.col("embedding").alias("ea")
    )
    epairs = probes_f.join(
        emb.select(F.col("vec_id").alias("c"), F.col("embedding").alias("eb")),
        F.col("q") != F.col("c"),
    ).select(
        "q",
        "c",
        cosine_similarity(F.col("ea"), F.col("eb")).alias("cos"),
    )
    we = Window.partitionBy("q").orderBy(F.desc("cos"), "c")
    exact = epairs.select(
        "q", "c", F.row_number().over(we).alias("rn")
    ).where(F.col("rn") <= 10)

    hit = quant.select("q", "c", F.lit(1).alias("hit"))
    return (
        exact.select("q", "c")
        .join(hit, ["q", "c"], "left")
        .groupBy(F.col("q").alias("q_vec_id"))
        .agg(F.count("hit").alias("recall10_hits"))
    )
