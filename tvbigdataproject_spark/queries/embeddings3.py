"""Round-9 embeddings batch 3: exact covariance structure.

embed_covariance_pairs — the full upper-triangle covariance matrix of
the embedding corpus (2080 pairs at dim 64), computed the way a 100 TB
corpus has to compute it: each partition collapses its rows to ONE
(dim x dim) integer Gram matrix with a vectorized int64 matmul inside
mapInPandas, and only those 2145-row partials shuffle. The naive
posexplode + self-join form shuffles N * dim^2 rows — six orders of
magnitude more traffic at any interesting N — and is exactly the shape
the SemDeDup ladder measured super-linear.

Covariance is the embedding-health object one level up from
embed_dim_profile's per-dimension variances: off-diagonal mass is what
whitening / PCA / matryoshka truncation decisions read (a pair of
highly covariant dimensions is redundant capacity; a block of them is
a rotated subspace).

Cross-engine exactness: the fixed-point convention of
embed_dim_profile (milli units: FLOOR(float-widened * 1000) — exact
IEEE in both engines); every Gram sum is an exact int64 (numpy int64
matmul partials; products ~1e8, partition sums ~1e13); the covariance
is the identical double expression over agreed integers in both
engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_CV_DIM = 64
_CV_SCALE = 1000


@query(
    "embed_covariance_pairs",
    sql=f"""
    WITH m AS (
        SELECT vec_id, t.i AS i,
               CAST(FLOOR(embedding[t.i]::DOUBLE * {_CV_SCALE}) AS BIGINT)
                   AS v
        FROM embeddings, UNNEST(range(1, {_CV_DIM + 1})) AS t(i)
    ),
    p AS (
        SELECT a.i AS i, b.i AS j, CAST(SUM(a.v * b.v) AS BIGINT) AS s
        FROM m a JOIN m b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY 1, 2
    ),
    d AS (SELECT i, CAST(SUM(v) AS BIGINT) AS si FROM m GROUP BY 1),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings)
    SELECT p.i, p.j, t.n, p.s, da.si AS si, db.si AS sj,
           CAST(p.s AS DOUBLE) / t.n
               - (CAST(da.si AS DOUBLE) / t.n)
                 * (CAST(db.si AS DOUBLE) / t.n) AS cov_milli2
    FROM p
    JOIN d da ON da.i = p.i
    JOIN d db ON db.i = p.j
    CROSS JOIN t
    """,
    tags=("llm", "embeddings", "stats"),
)
def embed_covariance_pairs(spark, sf_dir):
    """Upper-triangle covariance of the embedding matrix in milli^2
    fixed-point units — 2080 (i <= j) pairs at dim {_CV_DIM}.

    The scale story IS the query: the DataFrame side runs ONE
    mapInPandas stage in which each partition computes its integer
    Gram matrix M^T M with a single vectorized int64 matmul and emits
    2145 partial rows (2080 pair sums + 64 column sums + a row count);
    the shuffle then carries partials-per-partition, NOT
    rows-x-dim^2. The DuckDB oracle brute-forces the same definition
    relationally (fine at sf0.01; the relational form is the shape
    that does NOT survive 100x, which is the point of the kernel).

    Exactness: milli fixed-point (embed_dim_profile convention) makes
    every Gram entry an exact int64 — numpy int64 matmul is exact and
    associative, so partition boundaries cannot change the sums; the
    one double expression per output column is identical text in both
    engines. The one-row count attaches by broadcast (intended NLJ
    over the bounded 2080-row pair table).
    """
    import numpy as np
    import pandas as pd

    emb = read_table(spark, sf_dir, "embeddings").select("embedding")
    iu0, iu1 = np.triu_indices(_CV_DIM)

    def partials(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.floor(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                * _CV_SCALE
            ).astype(np.int64)
            gram = m.T @ m
            yield pd.DataFrame(
                {
                    "i": np.concatenate(
                        [iu0 + 1, np.arange(1, _CV_DIM + 1), [-1]]
                    ).astype("int32"),
                    "j": np.concatenate(
                        [iu1 + 1, np.full(_CV_DIM, -1), [-1]]
                    ).astype("int32"),
                    "s": np.concatenate(
                        [gram[iu0, iu1], m.sum(axis=0), [m.shape[0]]]
                    ).astype("int64"),
                }
            )

    tot = (
        emb.mapInPandas(partials, schema="i int, j int, s long")
        .groupBy("i", "j")
        .agg(F.sum("s").cast("long").alias("s"))
    )
    pairs = tot.where(F.col("j") >= 1)
    dims = tot.where((F.col("j") == -1) & (F.col("i") >= 1)).select(
        "i", F.col("s").alias("si")
    )
    nrow = tot.where(F.col("i") == -1).select(F.col("s").alias("n"))
    return (
        pairs.join(F.broadcast(dims), "i")
        .join(
            F.broadcast(
                dims.select(F.col("i").alias("j"), F.col("si").alias("sj"))
            ),
            "j",
        )
        .crossJoin(F.broadcast(nrow))
        .select(
            "i",
            "j",
            "n",
            "s",
            "si",
            "sj",
            (
                F.col("s").cast("double") / F.col("n")
                - (F.col("si").cast("double") / F.col("n"))
                * (F.col("sj").cast("double") / F.col("n"))
            ).alias("cov_milli2"),
        )
    )
