"""Embeddings batch 2: per-label dispersion (cluster quality).

embed_centroid_by_label gives the class centroids; this measures how
TIGHT each class is around its centroid — the number that separates a
coherent label from a grab-bag one (high dispersion labels are split
candidates for IVF cell sizing, low ones SemDeDup-prune harder). All
arithmetic follows the kmeans_lloyd exactness contract: 2^20 integer
quantization, floor(sum/n) centroids, exact BIGINT squared distances.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.operators.clustering import (
    QUANT_SCALE,
    quantize_vectors,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_DIM = 64

_LD_SUMS = ", ".join(f"SUM(qv[{i}]) AS s{i}" for i in range(1, _DIM + 1))
_LD_CENT = ", ".join(
    f"CAST(floor(s{i}::DOUBLE / n) AS BIGINT) AS c{i}"
    for i in range(1, _DIM + 1)
)
_LD_DIST = " + ".join(
    f"(v.qv[{i}] - c.c{i}) * (v.qv[{i}] - c.c{i})"
    for i in range(1, _DIM + 1)
)


@query(
    "embed_label_dispersion",
    sql=f"""
    WITH q AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   x -> CAST(round(x::DOUBLE * {QUANT_SCALE}.0) AS BIGINT))
                   AS qv
        FROM embeddings
    ),
    sums AS (
        SELECT label, COUNT(*) AS n, {_LD_SUMS} FROM q GROUP BY label
    ),
    cent AS (SELECT label, n, {_LD_CENT} FROM sums),
    d AS (
        SELECT v.label, {_LD_DIST} AS dq
        FROM q v JOIN cent c ON v.label = c.label
    )
    SELECT label, COUNT(*) AS n,
           CAST(SUM(dq) AS BIGINT) AS total_disp,
           CAST(SUM(dq) // COUNT(*) AS BIGINT) AS avg_disp,
           CAST(SUM(dq) AS DOUBLE) / COUNT(*) AS avg_disp_f
    FROM d GROUP BY label
    """,
    tags=("embeddings", "clustering", "quality"),
)
def embed_label_dispersion(spark, sf_dir):
    """Within-class dispersion per label: the exact integer squared
    distance of every vector to its label's floor(sum/n) centroid,
    aggregated to (n, total, avg) — the inertia decomposition that
    grades label coherence (and, summed, the k-means objective the
    Lloyd rounds minimize). Follows kmeans_lloyd's exactness contract
    end to end, so both engines agree bit-for-bit on every distance.

    Scale shape: one 64-sum map-side-partial aggregation to the label
    table (bounded by the label domain), centroids broadcast back over
    one corpus scan, one grouped reduce. The corpus never shuffles; no
    window anywhere.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    q = quantize_vectors(emb).select("vec_id", "label", "qv")
    sums = q.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.col("qv")[i]).alias(f"s{i}") for i in range(_DIM)],
    )
    cent = sums.select(
        "label",
        F.array(
            *[
                F.floor(F.col(f"s{i}").cast("double") / F.col("n"))
                .cast("long")
                for i in range(_DIM)
            ]
        ).alias("cv"),
    )
    dq = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    d = q.join(F.broadcast(cent), "label").select("label", dq.alias("dq"))
    return d.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dq").cast("long").alias("total_disp"),
        F.expr("sum(dq) div count(1)").cast("long").alias("avg_disp"),
        (F.sum("dq").cast("double") / F.count(F.lit(1))).alias(
            "avg_disp_f"
        ),
    )
