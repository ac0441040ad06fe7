"""Similarity search over embedding columns (north-star surface).

Plan shapes (see queries/embeddings.py for the oracle-checked
instantiations):
  cosine_topk        brute force — broadcast query set × partitioned
                     corpus; the exact baseline every ANN is measured by
  cell_pruned_topk   IVF-style — equi-join on a coarse cell id prunes
                     the candidate set to the probed cell(s)
  cosine_neardup_pairs  near-dup pairs blocked by cell

All vector math is zip_with/aggregate over array<double>
(functions/vectors.py) — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.functions import cosine_similarity


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (brute force).

    ``queries`` must be broadcast-sized (it is replicated to every
    corpus partition); ranking carries an id tiebreak so top-k is
    deterministic at any parallelism.
    """
    q = queries.select(
        F.col(id_col).alias("q_vec_id"), F.col(vec_col).alias("q_emb")
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            F.col(id_col).alias("vec_id"),
            cosine_similarity(F.col("q_emb"), F.col(vec_col)).alias("cos"),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.select(
        "q_vec_id", "vec_id", "cos", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= k)


def cell_pruned_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style top-k: candidates restricted to the query's coarse cell.

    The cell id here is a precomputed column; in a full IVF build it is
    the nearest-centroid assignment from a k-means pass — the plan shape
    (equi-join on cell, per-cell scan) is identical either way.
    """
    q = queries.select(
        F.col(id_col).alias("q_vec_id"),
        F.col(cell_col).alias("q_cell"),
        F.col(vec_col).alias("q_emb"),
    )
    scored = (
        corpus.join(F.broadcast(q), F.col(cell_col) == F.col("q_cell"))
        .where(F.col(id_col) != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            F.col(id_col).alias("vec_id"),
            cosine_similarity(F.col("q_emb"), F.col(vec_col)).alias("cos"),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.select(
        "q_vec_id", "vec_id", "cos", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= k)


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Embedding-space near-duplicate pairs (cos ≥ threshold), blocked by
    the coarse cell so the pair space is per-cell, not global."""
    a = corpus.select(
        F.col(id_col).alias("vec_a"),
        F.col(cell_col).alias("cell_a"),
        F.col(vec_col).alias("emb_a"),
    )
    b = corpus.select(
        F.col(id_col).alias("vec_b"),
        F.col(cell_col).alias("cell_b"),
        F.col(vec_col).alias("emb_b"),
    )
    pairs = a.join(b, (F.col("cell_a") == F.col("cell_b")) & (F.col("vec_a") < F.col("vec_b")))
    cos = cosine_similarity(F.col("emb_a"), F.col("emb_b"))
    return pairs.where(cos >= threshold).select("vec_a", "vec_b", cos.alias("cos"))
