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


_HNM_SUB = 16  # one PQ subspace = 16 of 64 dims


def _hnm_code_cte(sub: int) -> str:
    lo = sub * _HNM_SUB + 1
    dist = " + ".join(
        f"(v.qv[{i}] - s.cv[{i}]) * (v.qv[{i}] - s.cv[{i}])"
        for i in range(lo, lo + _HNM_SUB)
    )
    return f"""
    k{sub} AS (
        SELECT vec_id, cw AS c{sub} FROM (
            SELECT v.vec_id, s.cw,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {dist}, s.cw) AS rn
            FROM qp v CROSS JOIN seeds s
        ) WHERE rn = 1
    )"""


@query(
    "hard_negative_mining",
    sql=f"""
    WITH qp AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(x::DOUBLE * {QUANT_SCALE}.0) AS BIGINT))
                   AS qv
        FROM embeddings
    ),
    seeds AS (
        SELECT CAST(ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
               AS INT) AS cw,
               qv AS cv
        FROM qp
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT 16
    ),
    {_hnm_code_cte(0)},{_hnm_code_cte(1)},
    b AS (
        SELECT e.vec_id, e.label, e.embedding,
               k0.c0 * 16 + k1.c1 AS blk
        FROM embeddings e
        JOIN k0 ON e.vec_id = k0.vec_id
        JOIN k1 ON e.vec_id = k1.vec_id
    ),
    cand AS (
        SELECT a.vec_id, b.vec_id AS neg_id,
               a.label AS own_label, b.label AS neg_label,
               (a.embedding[1]::DOUBLE * b.embedding[1]::DOUBLE + a.embedding[2]::DOUBLE * b.embedding[2]::DOUBLE + a.embedding[3]::DOUBLE * b.embedding[3]::DOUBLE + a.embedding[4]::DOUBLE * b.embedding[4]::DOUBLE + a.embedding[5]::DOUBLE * b.embedding[5]::DOUBLE + a.embedding[6]::DOUBLE * b.embedding[6]::DOUBLE + a.embedding[7]::DOUBLE * b.embedding[7]::DOUBLE + a.embedding[8]::DOUBLE * b.embedding[8]::DOUBLE + a.embedding[9]::DOUBLE * b.embedding[9]::DOUBLE + a.embedding[10]::DOUBLE * b.embedding[10]::DOUBLE + a.embedding[11]::DOUBLE * b.embedding[11]::DOUBLE + a.embedding[12]::DOUBLE * b.embedding[12]::DOUBLE + a.embedding[13]::DOUBLE * b.embedding[13]::DOUBLE + a.embedding[14]::DOUBLE * b.embedding[14]::DOUBLE + a.embedding[15]::DOUBLE * b.embedding[15]::DOUBLE + a.embedding[16]::DOUBLE * b.embedding[16]::DOUBLE + a.embedding[17]::DOUBLE * b.embedding[17]::DOUBLE + a.embedding[18]::DOUBLE * b.embedding[18]::DOUBLE + a.embedding[19]::DOUBLE * b.embedding[19]::DOUBLE + a.embedding[20]::DOUBLE * b.embedding[20]::DOUBLE + a.embedding[21]::DOUBLE * b.embedding[21]::DOUBLE + a.embedding[22]::DOUBLE * b.embedding[22]::DOUBLE + a.embedding[23]::DOUBLE * b.embedding[23]::DOUBLE + a.embedding[24]::DOUBLE * b.embedding[24]::DOUBLE + a.embedding[25]::DOUBLE * b.embedding[25]::DOUBLE + a.embedding[26]::DOUBLE * b.embedding[26]::DOUBLE + a.embedding[27]::DOUBLE * b.embedding[27]::DOUBLE + a.embedding[28]::DOUBLE * b.embedding[28]::DOUBLE + a.embedding[29]::DOUBLE * b.embedding[29]::DOUBLE + a.embedding[30]::DOUBLE * b.embedding[30]::DOUBLE + a.embedding[31]::DOUBLE * b.embedding[31]::DOUBLE + a.embedding[32]::DOUBLE * b.embedding[32]::DOUBLE + a.embedding[33]::DOUBLE * b.embedding[33]::DOUBLE + a.embedding[34]::DOUBLE * b.embedding[34]::DOUBLE + a.embedding[35]::DOUBLE * b.embedding[35]::DOUBLE + a.embedding[36]::DOUBLE * b.embedding[36]::DOUBLE + a.embedding[37]::DOUBLE * b.embedding[37]::DOUBLE + a.embedding[38]::DOUBLE * b.embedding[38]::DOUBLE + a.embedding[39]::DOUBLE * b.embedding[39]::DOUBLE + a.embedding[40]::DOUBLE * b.embedding[40]::DOUBLE + a.embedding[41]::DOUBLE * b.embedding[41]::DOUBLE + a.embedding[42]::DOUBLE * b.embedding[42]::DOUBLE + a.embedding[43]::DOUBLE * b.embedding[43]::DOUBLE + a.embedding[44]::DOUBLE * b.embedding[44]::DOUBLE + a.embedding[45]::DOUBLE * b.embedding[45]::DOUBLE + a.embedding[46]::DOUBLE * b.embedding[46]::DOUBLE + a.embedding[47]::DOUBLE * b.embedding[47]::DOUBLE + a.embedding[48]::DOUBLE * b.embedding[48]::DOUBLE + a.embedding[49]::DOUBLE * b.embedding[49]::DOUBLE + a.embedding[50]::DOUBLE * b.embedding[50]::DOUBLE + a.embedding[51]::DOUBLE * b.embedding[51]::DOUBLE + a.embedding[52]::DOUBLE * b.embedding[52]::DOUBLE + a.embedding[53]::DOUBLE * b.embedding[53]::DOUBLE + a.embedding[54]::DOUBLE * b.embedding[54]::DOUBLE + a.embedding[55]::DOUBLE * b.embedding[55]::DOUBLE + a.embedding[56]::DOUBLE * b.embedding[56]::DOUBLE + a.embedding[57]::DOUBLE * b.embedding[57]::DOUBLE + a.embedding[58]::DOUBLE * b.embedding[58]::DOUBLE + a.embedding[59]::DOUBLE * b.embedding[59]::DOUBLE + a.embedding[60]::DOUBLE * b.embedding[60]::DOUBLE + a.embedding[61]::DOUBLE * b.embedding[61]::DOUBLE + a.embedding[62]::DOUBLE * b.embedding[62]::DOUBLE + a.embedding[63]::DOUBLE * b.embedding[63]::DOUBLE + a.embedding[64]::DOUBLE * b.embedding[64]::DOUBLE) / (sqrt(a.embedding[1]::DOUBLE * a.embedding[1]::DOUBLE + a.embedding[2]::DOUBLE * a.embedding[2]::DOUBLE + a.embedding[3]::DOUBLE * a.embedding[3]::DOUBLE + a.embedding[4]::DOUBLE * a.embedding[4]::DOUBLE + a.embedding[5]::DOUBLE * a.embedding[5]::DOUBLE + a.embedding[6]::DOUBLE * a.embedding[6]::DOUBLE + a.embedding[7]::DOUBLE * a.embedding[7]::DOUBLE + a.embedding[8]::DOUBLE * a.embedding[8]::DOUBLE + a.embedding[9]::DOUBLE * a.embedding[9]::DOUBLE + a.embedding[10]::DOUBLE * a.embedding[10]::DOUBLE + a.embedding[11]::DOUBLE * a.embedding[11]::DOUBLE + a.embedding[12]::DOUBLE * a.embedding[12]::DOUBLE + a.embedding[13]::DOUBLE * a.embedding[13]::DOUBLE + a.embedding[14]::DOUBLE * a.embedding[14]::DOUBLE + a.embedding[15]::DOUBLE * a.embedding[15]::DOUBLE + a.embedding[16]::DOUBLE * a.embedding[16]::DOUBLE + a.embedding[17]::DOUBLE * a.embedding[17]::DOUBLE + a.embedding[18]::DOUBLE * a.embedding[18]::DOUBLE + a.embedding[19]::DOUBLE * a.embedding[19]::DOUBLE + a.embedding[20]::DOUBLE * a.embedding[20]::DOUBLE + a.embedding[21]::DOUBLE * a.embedding[21]::DOUBLE + a.embedding[22]::DOUBLE * a.embedding[22]::DOUBLE + a.embedding[23]::DOUBLE * a.embedding[23]::DOUBLE + a.embedding[24]::DOUBLE * a.embedding[24]::DOUBLE + a.embedding[25]::DOUBLE * a.embedding[25]::DOUBLE + a.embedding[26]::DOUBLE * a.embedding[26]::DOUBLE + a.embedding[27]::DOUBLE * a.embedding[27]::DOUBLE + a.embedding[28]::DOUBLE * a.embedding[28]::DOUBLE + a.embedding[29]::DOUBLE * a.embedding[29]::DOUBLE + a.embedding[30]::DOUBLE * a.embedding[30]::DOUBLE + a.embedding[31]::DOUBLE * a.embedding[31]::DOUBLE + a.embedding[32]::DOUBLE * a.embedding[32]::DOUBLE + a.embedding[33]::DOUBLE * a.embedding[33]::DOUBLE + a.embedding[34]::DOUBLE * a.embedding[34]::DOUBLE + a.embedding[35]::DOUBLE * a.embedding[35]::DOUBLE + a.embedding[36]::DOUBLE * a.embedding[36]::DOUBLE + a.embedding[37]::DOUBLE * a.embedding[37]::DOUBLE + a.embedding[38]::DOUBLE * a.embedding[38]::DOUBLE + a.embedding[39]::DOUBLE * a.embedding[39]::DOUBLE + a.embedding[40]::DOUBLE * a.embedding[40]::DOUBLE + a.embedding[41]::DOUBLE * a.embedding[41]::DOUBLE + a.embedding[42]::DOUBLE * a.embedding[42]::DOUBLE + a.embedding[43]::DOUBLE * a.embedding[43]::DOUBLE + a.embedding[44]::DOUBLE * a.embedding[44]::DOUBLE + a.embedding[45]::DOUBLE * a.embedding[45]::DOUBLE + a.embedding[46]::DOUBLE * a.embedding[46]::DOUBLE + a.embedding[47]::DOUBLE * a.embedding[47]::DOUBLE + a.embedding[48]::DOUBLE * a.embedding[48]::DOUBLE + a.embedding[49]::DOUBLE * a.embedding[49]::DOUBLE + a.embedding[50]::DOUBLE * a.embedding[50]::DOUBLE + a.embedding[51]::DOUBLE * a.embedding[51]::DOUBLE + a.embedding[52]::DOUBLE * a.embedding[52]::DOUBLE + a.embedding[53]::DOUBLE * a.embedding[53]::DOUBLE + a.embedding[54]::DOUBLE * a.embedding[54]::DOUBLE + a.embedding[55]::DOUBLE * a.embedding[55]::DOUBLE + a.embedding[56]::DOUBLE * a.embedding[56]::DOUBLE + a.embedding[57]::DOUBLE * a.embedding[57]::DOUBLE + a.embedding[58]::DOUBLE * a.embedding[58]::DOUBLE + a.embedding[59]::DOUBLE * a.embedding[59]::DOUBLE + a.embedding[60]::DOUBLE * a.embedding[60]::DOUBLE + a.embedding[61]::DOUBLE * a.embedding[61]::DOUBLE + a.embedding[62]::DOUBLE * a.embedding[62]::DOUBLE + a.embedding[63]::DOUBLE * a.embedding[63]::DOUBLE + a.embedding[64]::DOUBLE * a.embedding[64]::DOUBLE) * sqrt(b.embedding[1]::DOUBLE * b.embedding[1]::DOUBLE + b.embedding[2]::DOUBLE * b.embedding[2]::DOUBLE + b.embedding[3]::DOUBLE * b.embedding[3]::DOUBLE + b.embedding[4]::DOUBLE * b.embedding[4]::DOUBLE + b.embedding[5]::DOUBLE * b.embedding[5]::DOUBLE + b.embedding[6]::DOUBLE * b.embedding[6]::DOUBLE + b.embedding[7]::DOUBLE * b.embedding[7]::DOUBLE + b.embedding[8]::DOUBLE * b.embedding[8]::DOUBLE + b.embedding[9]::DOUBLE * b.embedding[9]::DOUBLE + b.embedding[10]::DOUBLE * b.embedding[10]::DOUBLE + b.embedding[11]::DOUBLE * b.embedding[11]::DOUBLE + b.embedding[12]::DOUBLE * b.embedding[12]::DOUBLE + b.embedding[13]::DOUBLE * b.embedding[13]::DOUBLE + b.embedding[14]::DOUBLE * b.embedding[14]::DOUBLE + b.embedding[15]::DOUBLE * b.embedding[15]::DOUBLE + b.embedding[16]::DOUBLE * b.embedding[16]::DOUBLE + b.embedding[17]::DOUBLE * b.embedding[17]::DOUBLE + b.embedding[18]::DOUBLE * b.embedding[18]::DOUBLE + b.embedding[19]::DOUBLE * b.embedding[19]::DOUBLE + b.embedding[20]::DOUBLE * b.embedding[20]::DOUBLE + b.embedding[21]::DOUBLE * b.embedding[21]::DOUBLE + b.embedding[22]::DOUBLE * b.embedding[22]::DOUBLE + b.embedding[23]::DOUBLE * b.embedding[23]::DOUBLE + b.embedding[24]::DOUBLE * b.embedding[24]::DOUBLE + b.embedding[25]::DOUBLE * b.embedding[25]::DOUBLE + b.embedding[26]::DOUBLE * b.embedding[26]::DOUBLE + b.embedding[27]::DOUBLE * b.embedding[27]::DOUBLE + b.embedding[28]::DOUBLE * b.embedding[28]::DOUBLE + b.embedding[29]::DOUBLE * b.embedding[29]::DOUBLE + b.embedding[30]::DOUBLE * b.embedding[30]::DOUBLE + b.embedding[31]::DOUBLE * b.embedding[31]::DOUBLE + b.embedding[32]::DOUBLE * b.embedding[32]::DOUBLE + b.embedding[33]::DOUBLE * b.embedding[33]::DOUBLE + b.embedding[34]::DOUBLE * b.embedding[34]::DOUBLE + b.embedding[35]::DOUBLE * b.embedding[35]::DOUBLE + b.embedding[36]::DOUBLE * b.embedding[36]::DOUBLE + b.embedding[37]::DOUBLE * b.embedding[37]::DOUBLE + b.embedding[38]::DOUBLE * b.embedding[38]::DOUBLE + b.embedding[39]::DOUBLE * b.embedding[39]::DOUBLE + b.embedding[40]::DOUBLE * b.embedding[40]::DOUBLE + b.embedding[41]::DOUBLE * b.embedding[41]::DOUBLE + b.embedding[42]::DOUBLE * b.embedding[42]::DOUBLE + b.embedding[43]::DOUBLE * b.embedding[43]::DOUBLE + b.embedding[44]::DOUBLE * b.embedding[44]::DOUBLE + b.embedding[45]::DOUBLE * b.embedding[45]::DOUBLE + b.embedding[46]::DOUBLE * b.embedding[46]::DOUBLE + b.embedding[47]::DOUBLE * b.embedding[47]::DOUBLE + b.embedding[48]::DOUBLE * b.embedding[48]::DOUBLE + b.embedding[49]::DOUBLE * b.embedding[49]::DOUBLE + b.embedding[50]::DOUBLE * b.embedding[50]::DOUBLE + b.embedding[51]::DOUBLE * b.embedding[51]::DOUBLE + b.embedding[52]::DOUBLE * b.embedding[52]::DOUBLE + b.embedding[53]::DOUBLE * b.embedding[53]::DOUBLE + b.embedding[54]::DOUBLE * b.embedding[54]::DOUBLE + b.embedding[55]::DOUBLE * b.embedding[55]::DOUBLE + b.embedding[56]::DOUBLE * b.embedding[56]::DOUBLE + b.embedding[57]::DOUBLE * b.embedding[57]::DOUBLE + b.embedding[58]::DOUBLE * b.embedding[58]::DOUBLE + b.embedding[59]::DOUBLE * b.embedding[59]::DOUBLE + b.embedding[60]::DOUBLE * b.embedding[60]::DOUBLE + b.embedding[61]::DOUBLE * b.embedding[61]::DOUBLE + b.embedding[62]::DOUBLE * b.embedding[62]::DOUBLE + b.embedding[63]::DOUBLE * b.embedding[63]::DOUBLE + b.embedding[64]::DOUBLE * b.embedding[64]::DOUBLE)) AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY (a.embedding[1]::DOUBLE * b.embedding[1]::DOUBLE + a.embedding[2]::DOUBLE * b.embedding[2]::DOUBLE + a.embedding[3]::DOUBLE * b.embedding[3]::DOUBLE + a.embedding[4]::DOUBLE * b.embedding[4]::DOUBLE + a.embedding[5]::DOUBLE * b.embedding[5]::DOUBLE + a.embedding[6]::DOUBLE * b.embedding[6]::DOUBLE + a.embedding[7]::DOUBLE * b.embedding[7]::DOUBLE + a.embedding[8]::DOUBLE * b.embedding[8]::DOUBLE + a.embedding[9]::DOUBLE * b.embedding[9]::DOUBLE + a.embedding[10]::DOUBLE * b.embedding[10]::DOUBLE + a.embedding[11]::DOUBLE * b.embedding[11]::DOUBLE + a.embedding[12]::DOUBLE * b.embedding[12]::DOUBLE + a.embedding[13]::DOUBLE * b.embedding[13]::DOUBLE + a.embedding[14]::DOUBLE * b.embedding[14]::DOUBLE + a.embedding[15]::DOUBLE * b.embedding[15]::DOUBLE + a.embedding[16]::DOUBLE * b.embedding[16]::DOUBLE + a.embedding[17]::DOUBLE * b.embedding[17]::DOUBLE + a.embedding[18]::DOUBLE * b.embedding[18]::DOUBLE + a.embedding[19]::DOUBLE * b.embedding[19]::DOUBLE + a.embedding[20]::DOUBLE * b.embedding[20]::DOUBLE + a.embedding[21]::DOUBLE * b.embedding[21]::DOUBLE + a.embedding[22]::DOUBLE * b.embedding[22]::DOUBLE + a.embedding[23]::DOUBLE * b.embedding[23]::DOUBLE + a.embedding[24]::DOUBLE * b.embedding[24]::DOUBLE + a.embedding[25]::DOUBLE * b.embedding[25]::DOUBLE + a.embedding[26]::DOUBLE * b.embedding[26]::DOUBLE + a.embedding[27]::DOUBLE * b.embedding[27]::DOUBLE + a.embedding[28]::DOUBLE * b.embedding[28]::DOUBLE + a.embedding[29]::DOUBLE * b.embedding[29]::DOUBLE + a.embedding[30]::DOUBLE * b.embedding[30]::DOUBLE + a.embedding[31]::DOUBLE * b.embedding[31]::DOUBLE + a.embedding[32]::DOUBLE * b.embedding[32]::DOUBLE + a.embedding[33]::DOUBLE * b.embedding[33]::DOUBLE + a.embedding[34]::DOUBLE * b.embedding[34]::DOUBLE + a.embedding[35]::DOUBLE * b.embedding[35]::DOUBLE + a.embedding[36]::DOUBLE * b.embedding[36]::DOUBLE + a.embedding[37]::DOUBLE * b.embedding[37]::DOUBLE + a.embedding[38]::DOUBLE * b.embedding[38]::DOUBLE + a.embedding[39]::DOUBLE * b.embedding[39]::DOUBLE + a.embedding[40]::DOUBLE * b.embedding[40]::DOUBLE + a.embedding[41]::DOUBLE * b.embedding[41]::DOUBLE + a.embedding[42]::DOUBLE * b.embedding[42]::DOUBLE + a.embedding[43]::DOUBLE * b.embedding[43]::DOUBLE + a.embedding[44]::DOUBLE * b.embedding[44]::DOUBLE + a.embedding[45]::DOUBLE * b.embedding[45]::DOUBLE + a.embedding[46]::DOUBLE * b.embedding[46]::DOUBLE + a.embedding[47]::DOUBLE * b.embedding[47]::DOUBLE + a.embedding[48]::DOUBLE * b.embedding[48]::DOUBLE + a.embedding[49]::DOUBLE * b.embedding[49]::DOUBLE + a.embedding[50]::DOUBLE * b.embedding[50]::DOUBLE + a.embedding[51]::DOUBLE * b.embedding[51]::DOUBLE + a.embedding[52]::DOUBLE * b.embedding[52]::DOUBLE + a.embedding[53]::DOUBLE * b.embedding[53]::DOUBLE + a.embedding[54]::DOUBLE * b.embedding[54]::DOUBLE + a.embedding[55]::DOUBLE * b.embedding[55]::DOUBLE + a.embedding[56]::DOUBLE * b.embedding[56]::DOUBLE + a.embedding[57]::DOUBLE * b.embedding[57]::DOUBLE + a.embedding[58]::DOUBLE * b.embedding[58]::DOUBLE + a.embedding[59]::DOUBLE * b.embedding[59]::DOUBLE + a.embedding[60]::DOUBLE * b.embedding[60]::DOUBLE + a.embedding[61]::DOUBLE * b.embedding[61]::DOUBLE + a.embedding[62]::DOUBLE * b.embedding[62]::DOUBLE + a.embedding[63]::DOUBLE * b.embedding[63]::DOUBLE + a.embedding[64]::DOUBLE * b.embedding[64]::DOUBLE) / (sqrt(a.embedding[1]::DOUBLE * a.embedding[1]::DOUBLE + a.embedding[2]::DOUBLE * a.embedding[2]::DOUBLE + a.embedding[3]::DOUBLE * a.embedding[3]::DOUBLE + a.embedding[4]::DOUBLE * a.embedding[4]::DOUBLE + a.embedding[5]::DOUBLE * a.embedding[5]::DOUBLE + a.embedding[6]::DOUBLE * a.embedding[6]::DOUBLE + a.embedding[7]::DOUBLE * a.embedding[7]::DOUBLE + a.embedding[8]::DOUBLE * a.embedding[8]::DOUBLE + a.embedding[9]::DOUBLE * a.embedding[9]::DOUBLE + a.embedding[10]::DOUBLE * a.embedding[10]::DOUBLE + a.embedding[11]::DOUBLE * a.embedding[11]::DOUBLE + a.embedding[12]::DOUBLE * a.embedding[12]::DOUBLE + a.embedding[13]::DOUBLE * a.embedding[13]::DOUBLE + a.embedding[14]::DOUBLE * a.embedding[14]::DOUBLE + a.embedding[15]::DOUBLE * a.embedding[15]::DOUBLE + a.embedding[16]::DOUBLE * a.embedding[16]::DOUBLE + a.embedding[17]::DOUBLE * a.embedding[17]::DOUBLE + a.embedding[18]::DOUBLE * a.embedding[18]::DOUBLE + a.embedding[19]::DOUBLE * a.embedding[19]::DOUBLE + a.embedding[20]::DOUBLE * a.embedding[20]::DOUBLE + a.embedding[21]::DOUBLE * a.embedding[21]::DOUBLE + a.embedding[22]::DOUBLE * a.embedding[22]::DOUBLE + a.embedding[23]::DOUBLE * a.embedding[23]::DOUBLE + a.embedding[24]::DOUBLE * a.embedding[24]::DOUBLE + a.embedding[25]::DOUBLE * a.embedding[25]::DOUBLE + a.embedding[26]::DOUBLE * a.embedding[26]::DOUBLE + a.embedding[27]::DOUBLE * a.embedding[27]::DOUBLE + a.embedding[28]::DOUBLE * a.embedding[28]::DOUBLE + a.embedding[29]::DOUBLE * a.embedding[29]::DOUBLE + a.embedding[30]::DOUBLE * a.embedding[30]::DOUBLE + a.embedding[31]::DOUBLE * a.embedding[31]::DOUBLE + a.embedding[32]::DOUBLE * a.embedding[32]::DOUBLE + a.embedding[33]::DOUBLE * a.embedding[33]::DOUBLE + a.embedding[34]::DOUBLE * a.embedding[34]::DOUBLE + a.embedding[35]::DOUBLE * a.embedding[35]::DOUBLE + a.embedding[36]::DOUBLE * a.embedding[36]::DOUBLE + a.embedding[37]::DOUBLE * a.embedding[37]::DOUBLE + a.embedding[38]::DOUBLE * a.embedding[38]::DOUBLE + a.embedding[39]::DOUBLE * a.embedding[39]::DOUBLE + a.embedding[40]::DOUBLE * a.embedding[40]::DOUBLE + a.embedding[41]::DOUBLE * a.embedding[41]::DOUBLE + a.embedding[42]::DOUBLE * a.embedding[42]::DOUBLE + a.embedding[43]::DOUBLE * a.embedding[43]::DOUBLE + a.embedding[44]::DOUBLE * a.embedding[44]::DOUBLE + a.embedding[45]::DOUBLE * a.embedding[45]::DOUBLE + a.embedding[46]::DOUBLE * a.embedding[46]::DOUBLE + a.embedding[47]::DOUBLE * a.embedding[47]::DOUBLE + a.embedding[48]::DOUBLE * a.embedding[48]::DOUBLE + a.embedding[49]::DOUBLE * a.embedding[49]::DOUBLE + a.embedding[50]::DOUBLE * a.embedding[50]::DOUBLE + a.embedding[51]::DOUBLE * a.embedding[51]::DOUBLE + a.embedding[52]::DOUBLE * a.embedding[52]::DOUBLE + a.embedding[53]::DOUBLE * a.embedding[53]::DOUBLE + a.embedding[54]::DOUBLE * a.embedding[54]::DOUBLE + a.embedding[55]::DOUBLE * a.embedding[55]::DOUBLE + a.embedding[56]::DOUBLE * a.embedding[56]::DOUBLE + a.embedding[57]::DOUBLE * a.embedding[57]::DOUBLE + a.embedding[58]::DOUBLE * a.embedding[58]::DOUBLE + a.embedding[59]::DOUBLE * a.embedding[59]::DOUBLE + a.embedding[60]::DOUBLE * a.embedding[60]::DOUBLE + a.embedding[61]::DOUBLE * a.embedding[61]::DOUBLE + a.embedding[62]::DOUBLE * a.embedding[62]::DOUBLE + a.embedding[63]::DOUBLE * a.embedding[63]::DOUBLE + a.embedding[64]::DOUBLE * a.embedding[64]::DOUBLE) * sqrt(b.embedding[1]::DOUBLE * b.embedding[1]::DOUBLE + b.embedding[2]::DOUBLE * b.embedding[2]::DOUBLE + b.embedding[3]::DOUBLE * b.embedding[3]::DOUBLE + b.embedding[4]::DOUBLE * b.embedding[4]::DOUBLE + b.embedding[5]::DOUBLE * b.embedding[5]::DOUBLE + b.embedding[6]::DOUBLE * b.embedding[6]::DOUBLE + b.embedding[7]::DOUBLE * b.embedding[7]::DOUBLE + b.embedding[8]::DOUBLE * b.embedding[8]::DOUBLE + b.embedding[9]::DOUBLE * b.embedding[9]::DOUBLE + b.embedding[10]::DOUBLE * b.embedding[10]::DOUBLE + b.embedding[11]::DOUBLE * b.embedding[11]::DOUBLE + b.embedding[12]::DOUBLE * b.embedding[12]::DOUBLE + b.embedding[13]::DOUBLE * b.embedding[13]::DOUBLE + b.embedding[14]::DOUBLE * b.embedding[14]::DOUBLE + b.embedding[15]::DOUBLE * b.embedding[15]::DOUBLE + b.embedding[16]::DOUBLE * b.embedding[16]::DOUBLE + b.embedding[17]::DOUBLE * b.embedding[17]::DOUBLE + b.embedding[18]::DOUBLE * b.embedding[18]::DOUBLE + b.embedding[19]::DOUBLE * b.embedding[19]::DOUBLE + b.embedding[20]::DOUBLE * b.embedding[20]::DOUBLE + b.embedding[21]::DOUBLE * b.embedding[21]::DOUBLE + b.embedding[22]::DOUBLE * b.embedding[22]::DOUBLE + b.embedding[23]::DOUBLE * b.embedding[23]::DOUBLE + b.embedding[24]::DOUBLE * b.embedding[24]::DOUBLE + b.embedding[25]::DOUBLE * b.embedding[25]::DOUBLE + b.embedding[26]::DOUBLE * b.embedding[26]::DOUBLE + b.embedding[27]::DOUBLE * b.embedding[27]::DOUBLE + b.embedding[28]::DOUBLE * b.embedding[28]::DOUBLE + b.embedding[29]::DOUBLE * b.embedding[29]::DOUBLE + b.embedding[30]::DOUBLE * b.embedding[30]::DOUBLE + b.embedding[31]::DOUBLE * b.embedding[31]::DOUBLE + b.embedding[32]::DOUBLE * b.embedding[32]::DOUBLE + b.embedding[33]::DOUBLE * b.embedding[33]::DOUBLE + b.embedding[34]::DOUBLE * b.embedding[34]::DOUBLE + b.embedding[35]::DOUBLE * b.embedding[35]::DOUBLE + b.embedding[36]::DOUBLE * b.embedding[36]::DOUBLE + b.embedding[37]::DOUBLE * b.embedding[37]::DOUBLE + b.embedding[38]::DOUBLE * b.embedding[38]::DOUBLE + b.embedding[39]::DOUBLE * b.embedding[39]::DOUBLE + b.embedding[40]::DOUBLE * b.embedding[40]::DOUBLE + b.embedding[41]::DOUBLE * b.embedding[41]::DOUBLE + b.embedding[42]::DOUBLE * b.embedding[42]::DOUBLE + b.embedding[43]::DOUBLE * b.embedding[43]::DOUBLE + b.embedding[44]::DOUBLE * b.embedding[44]::DOUBLE + b.embedding[45]::DOUBLE * b.embedding[45]::DOUBLE + b.embedding[46]::DOUBLE * b.embedding[46]::DOUBLE + b.embedding[47]::DOUBLE * b.embedding[47]::DOUBLE + b.embedding[48]::DOUBLE * b.embedding[48]::DOUBLE + b.embedding[49]::DOUBLE * b.embedding[49]::DOUBLE + b.embedding[50]::DOUBLE * b.embedding[50]::DOUBLE + b.embedding[51]::DOUBLE * b.embedding[51]::DOUBLE + b.embedding[52]::DOUBLE * b.embedding[52]::DOUBLE + b.embedding[53]::DOUBLE * b.embedding[53]::DOUBLE + b.embedding[54]::DOUBLE * b.embedding[54]::DOUBLE + b.embedding[55]::DOUBLE * b.embedding[55]::DOUBLE + b.embedding[56]::DOUBLE * b.embedding[56]::DOUBLE + b.embedding[57]::DOUBLE * b.embedding[57]::DOUBLE + b.embedding[58]::DOUBLE * b.embedding[58]::DOUBLE + b.embedding[59]::DOUBLE * b.embedding[59]::DOUBLE + b.embedding[60]::DOUBLE * b.embedding[60]::DOUBLE + b.embedding[61]::DOUBLE * b.embedding[61]::DOUBLE + b.embedding[62]::DOUBLE * b.embedding[62]::DOUBLE + b.embedding[63]::DOUBLE * b.embedding[63]::DOUBLE + b.embedding[64]::DOUBLE * b.embedding[64]::DOUBLE)) DESC, b.vec_id
               ) AS rn
        FROM b a JOIN b b ON a.blk = b.blk AND a.label <> b.label
    )
    SELECT vec_id, neg_id, own_label, neg_label, cos
    FROM cand WHERE rn = 1
    """,
    tags=("embeddings", "mining", "contrastive"),
)
def hard_negative_mining(spark, sf_dir):
    """Hard-negative mining for contrastive training: per vector, the
    most-similar vector of a DIFFERENT label inside its PQ (code0,
    code1) block — 256 md5-seeded buckets sharing embed_pq_codes'
    codebook — exactly the near-miss pairs a contrastive or reranker
    fine-tune wants, found without an all-pairs sweep because the PQ
    block bounds the candidate space the way an IVF cell bounds ANN.

    Determinism: block assignment is the exact-integer PQ argmin;
    similarity is the sequential-fold cosine (identical doubles in both
    engines); the per-vector winner breaks ties on neighbor id.

    Scale shape: one broadcast codebook scan (no corpus shuffle) for
    blocks, then ONE shuffle-hash self-join keyed on (block, salt) and
    one per-vector window. The round-9 sf1 gate caught the original
    16-block unsalted form funneling a dup-heavy 2M-vector corpus into
    <=16 single tasks of ~1e9 pair scores each (35+ min, unfinished):
    per-block pair volume is quadratic, so the block key is now the
    (code0, code1) product — 16x smaller blocks — and the a-side is
    salted with the b-side replicated (the cosine_neardup_pairs
    guards: per-pair cost dominates input bytes, and AQE coalescing is
    blind to join fan-out, so explicit repartition-by-number keeps the
    pair space spread). At still-denser corpora the key extends to
    (code0..code2) — 4096 blocks — the same ladder step.
    """
    from tvbigdataproject_spark.functions import cosine_similarity
    from tvbigdataproject_spark.operators.clustering import pq_assign
    from tvbigdataproject_spark.operators.skew import shuffle_partition_count

    _SALT = 8
    emb = read_table(spark, sf_dir, "embeddings")
    nparts = shuffle_partition_count(emb)
    blocks = pq_assign(emb).select(
        "vec_id", (F.col("code0") * 16 + F.col("code1")).alias("blk")
    )
    b = emb.join(blocks, "vec_id").select(
        "vec_id", "label", "embedding", "blk"
    )
    lhs = b.select(
        F.col("vec_id"),
        F.col("label").alias("own_label"),
        F.col("embedding").alias("_ea"),
        "blk",
        F.pmod(F.hash(F.col("vec_id")), F.lit(_SALT)).alias("_salt"),
    )
    rhs = b.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("embedding").alias("_eb"),
        F.col("blk").alias("_blk2"),
        F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1))).alias("_salt2"),
    )
    cand = (
        lhs.repartition(nparts, "blk", "_salt")
        .hint("SHUFFLE_HASH")
        .join(
            rhs.repartition(nparts, "_blk2", "_salt2").hint("SHUFFLE_HASH"),
            (F.col("blk") == F.col("_blk2"))
            & (F.col("_salt") == F.col("_salt2"))
            & (F.col("own_label") != F.col("neg_label")),
        )
    ).select(
        "vec_id",
        "neg_id",
        "own_label",
        "neg_label",
        cosine_similarity(F.col("_ea"), F.col("_eb")).alias("cos"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), "neg_id"
    )
    return (
        cand.select(
            "vec_id",
            "neg_id",
            "own_label",
            "neg_label",
            "cos",
            F.row_number().over(w).alias("_rn"),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# Matryoshka prefix audit: cosine over the first 16 of 64 dims vs the
# full vector — explicit per-index sums so the oracle's left-to-right
# float order matches the Spark HOF fold bit-for-bit (the embeddings.py
# convention), here parameterized by prefix length.
_MAT_PRE = 16


def _dot(pre: int, ac: str = "a", bc: str = "b") -> str:
    return " + ".join(
        f"{ac}.embedding[{i}]::DOUBLE * {bc}.embedding[{i}]::DOUBLE"
        for i in range(1, pre + 1)
    )


def _norm(pre: int, ac: str) -> str:
    return (
        "sqrt("
        + " + ".join(
            f"{ac}.embedding[{i}]::DOUBLE * {ac}.embedding[{i}]::DOUBLE"
            for i in range(1, pre + 1)
        )
        + ")"
    )


@query(
    "matryoshka_prefix_nn",
    sql=f"""
    WITH scored AS MATERIALIZED (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS vec_id,
               ({_dot(64)}) / ({_norm(64, 'a')} * {_norm(64, 'b')}) AS cos_full,
               ({_dot(_MAT_PRE)}) / ({_norm(_MAT_PRE, 'a')} * {_norm(_MAT_PRE, 'b')}) AS cos_pre
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 100
    ),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                  ORDER BY cos_full DESC, vec_id) AS rn_full,
               ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                  ORDER BY cos_pre DESC, vec_id) AS rn_pre
        FROM scored
    ),
    nf AS (SELECT q_vec_id, vec_id AS nn_full, cos_full AS best_full
           FROM r WHERE rn_full = 1),
    np AS (SELECT q_vec_id, vec_id AS nn_prefix, cos_pre AS best_pre,
                  cos_full AS full_at_prefix
           FROM r WHERE rn_pre = 1)
    SELECT nf.q_vec_id, nn_full, best_full, nn_prefix, best_pre,
           full_at_prefix,
           CASE WHEN nn_full = nn_prefix THEN 1 ELSE 0 END AS agree,
           best_full - full_at_prefix AS regret
    FROM nf JOIN np ON nf.q_vec_id = np.q_vec_id
    """,
    tags=("embeddings", "ann", "quantization"),
)
def matryoshka_prefix_nn(spark, sf_dir):
    """Matryoshka-style truncation audit: for 100 query vectors, the
    exact nearest neighbor under FULL 64-dim cosine vs under the first
    16 dims only — per query the agreement flag and the cosine REGRET
    (how much full-space similarity the truncated index gives up).
    This is the measurement that sizes a matryoshka/truncated-index
    tier before deploying it (the int8 quantize_recall_topk pattern,
    applied to dimension truncation instead of scalar quantization).

    Exactness: both cosines are explicit left-to-right per-index sums
    (the embeddings.py convention), ranking ties break on vec_id, and
    regret is one subtraction of two already-agreed doubles.

    Scale shape: the bounded query set broadcasts against one corpus
    scan (cosine_topk's plan); both rankings share one (q_vec_id)
    partitioning, so the pair stream shuffles once. Truncated scoring
    reads the SAME column (a slice of it) — no second index needed,
    which is the operational point of matryoshka embeddings.
    """
    from pyspark.sql import Window

    from tvbigdataproject_spark.functions import cosine_arrow

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(emb.select("vec_id", "embedding"))
        .where(F.col("q_vec_id") != F.col("vec_id"))
    )
    pre = lambda c: F.slice(c, 1, _MAT_PRE)  # noqa: E731
    # Arrow kernel (vectorized numpy, bitwise-equal fold order to the
    # HOF form and the oracle's explicit sums) — the HOF kernel on this
    # 200k-pair stream measured 9.5s of interpreted CodegenFallback
    # eval; one ArrowEvalPython stage scores both metrics
    scored = pairs.select(
        "q_vec_id",
        "vec_id",
        cosine_arrow(F.col("q_emb"), F.col("embedding")).alias("cos_full"),
        cosine_arrow(pre(F.col("q_emb")), pre(F.col("embedding"))).alias(
            "cos_pre"
        ),
    )
    w = Window.partitionBy("q_vec_id")
    r = scored.select(
        "*",
        F.row_number()
        .over(w.orderBy(F.desc("cos_full"), F.asc("vec_id")))
        .alias("rn_full"),
        F.row_number()
        .over(w.orderBy(F.desc("cos_pre"), F.asc("vec_id")))
        .alias("rn_pre"),
    )
    nf = r.where(F.col("rn_full") == 1).select(
        "q_vec_id",
        F.col("vec_id").alias("nn_full"),
        F.col("cos_full").alias("best_full"),
    )
    np_ = r.where(F.col("rn_pre") == 1).select(
        "q_vec_id",
        F.col("vec_id").alias("nn_prefix"),
        F.col("cos_pre").alias("best_pre"),
        F.col("cos_full").alias("full_at_prefix"),
    )
    return nf.join(np_, "q_vec_id").select(
        "q_vec_id",
        "nn_full",
        "best_full",
        "nn_prefix",
        "best_pre",
        "full_at_prefix",
        F.when(F.col("nn_full") == F.col("nn_prefix"), 1)
        .otherwise(0)
        .alias("agree"),
        (F.col("best_full") - F.col("full_at_prefix")).alias("regret"),
    )
