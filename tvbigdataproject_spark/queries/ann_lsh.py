"""Random-projection LSH over embeddings via pyspark.ml — the third ANN
tier next to brute force (embed_cosine_topk) and IVF cell pruning
(embed_ivf_topk).

BucketedRandomProjectionLSH hashes vectors onto seeded random lines;
approxSimilarityJoin then only compares pairs sharing a bucket — the
classic sublinear candidate generation when no precomputed cell id
exists. Seeded, so deterministic within Spark, but the projection
directions are Spark-internal randomness no other engine can replay —
hence a rows-only driver check (the exact twins are oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query("ann_lsh_bucketed", sql=None, tags=("embeddings", "ann", "lsh"))
def ann_lsh_bucketed(spark, sf_dir):
    """Euclidean near-neighbor pairs among L2-normalized embeddings via
    BucketedRandomProjectionLSH.approxSimilarityJoin.

    Vectors are normalized first so euclidean distance is monotone in
    cosine (d² = 2 - 2cos): threshold 1.18 ≈ cos ≥ 0.30
    (the synthetic corpus has no tighter neighbors — label clusters sit
    around cos 0.3, so this exercises the path with real output). Output:
    pairs under the distance threshold with their distance.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("raw")
    )
    normed = Normalizer(inputCol="raw", outputCol="features", p=2.0).transform(emb)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.5, numHashTables=4, seed=42
    )
    model = lsh.fit(normed)
    pairs = model.approxSimilarityJoin(normed, normed, threshold=1.18, distCol="dist")
    return (
        pairs.where(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.round("dist", 6).alias("dist"),
        )
    )
