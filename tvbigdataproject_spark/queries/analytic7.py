"""Analytics batch 7: RFM customer segmentation and per-domain
weighted sampling.

- rfm_segments           recency/frequency/monetary scoring with fixed
                         integer thresholds — the classic CRM
                         segmentation, scan-local per customer
- priority_sample_per_source  fixed-size weighted WITHOUT-replacement
                         sample PER DOMAIN (the grouped twin of
                         priority_sample_topk) — per-domain quotas are
                         how curation pipelines cap any one source

Both exact: RFM bins compare integer days/counts/cents against literal
thresholds; priorities are the integer floor w*2^32/(h+1) with md5
16-bit u — the proven priority-sampling convention, here ranked within
each source by a partitioned window instead of a global top-k.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.hashing import hex16_hash
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# fixed calendar anchor (the day after the TPC-H order horizon) and
# literal bin edges: thresholds are part of the query's semantics, so
# both engines compare the same integers — no quantile estimation
_RFM_ANCHOR = "1998-08-03"
_RFM_R_EDGES = (91, 365, 730)       # days:   <=91 | <=365 | <=730 | else
_RFM_F_EDGES = (20, 10, 5)          # orders: >=20 | >=10  | >=5   | else
_RFM_M_EDGES = (300_000_00, 150_000_00, 50_000_00)  # cents


def _band_desc(col: str, edges, best_first: bool) -> str:
    """SQL CASE producing 4..1; best_first=True means >= edge wins."""
    op = ">=" if best_first else "<="
    w = [
        f"WHEN {col} {op} {e} THEN {4 - i}" for i, e in enumerate(edges)
    ]
    return "CASE " + " ".join(w) + " ELSE 1 END"


@query(
    "rfm_segments",
    sql=f"""
    WITH base AS (
        SELECT o_custkey AS custkey,
               DATE '{_RFM_ANCHOR}' - MAX(CAST(o_orderdate AS DATE))
                   AS r_days,
               COUNT(*) AS f_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS m_cents
        FROM orders GROUP BY 1
    )
    SELECT custkey, CAST(r_days AS BIGINT) AS r_days, f_orders, m_cents,
           {_band_desc('r_days', _RFM_R_EDGES, False)} AS r_score,
           {_band_desc('f_orders', _RFM_F_EDGES, True)} AS f_score,
           {_band_desc('m_cents', _RFM_M_EDGES, True)} AS m_score,
           {_band_desc('r_days', _RFM_R_EDGES, False)} * 100
             + {_band_desc('f_orders', _RFM_F_EDGES, True)} * 10
             + {_band_desc('m_cents', _RFM_M_EDGES, True)} AS rfm_code
    FROM base
    """,
    tags=("analytics", "segmentation", "crm"),
)
def rfm_segments(spark, sf_dir):
    """RFM segmentation: per customer, days since last order (recency
    against the fixed 1998-08-03 anchor), order count (frequency), and
    lifetime cents (monetary), each banded 4..1 by LITERAL thresholds
    and packed into the classic 3-digit RFM code (444 = best). Fixed
    edges instead of quantile bins are deliberate: production RFM uses
    stable business thresholds so segments are comparable across runs,
    and integer threshold compares are exact in both engines (the
    quantile variant exists separately as decile_assign_range_join).

    Scale shape: one grouped aggregate per customer, then pure
    scan-local banding — no window, no join, no shuffle beyond the agg.
    """
    base = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(
                F.lit(_RFM_ANCHOR), F.max(F.to_date("o_orderdate"))
            )
            .cast("long")
            .alias("r_days"),
            F.count(F.lit(1)).alias("f_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("m_cents"),
        )
    )

    def band(col, edges, best_first):
        c = F.col(col)
        out = F.lit(1)
        # build from worst to best so the best condition wins last
        for i, e in reversed(list(enumerate(edges))):
            cond = (c >= e) if best_first else (c <= e)
            out = F.when(cond, 4 - i).otherwise(out)
        return out

    r = band("r_days", _RFM_R_EDGES, False)
    f = band("f_orders", _RFM_F_EDGES, True)
    m = band("m_cents", _RFM_M_EDGES, True)
    return base.select(
        "custkey",
        "r_days",
        "f_orders",
        "m_cents",
        r.alias("r_score"),
        f.alias("f_score"),
        m.alias("m_score"),
        (r * 100 + f * 10 + m).alias("rfm_code"),
    )


_PS_K = 10


@query(
    "priority_sample_per_source",
    sql=f"""
    WITH pri AS (
        SELECT doc_id, source, n_chars,
               (n_chars * 4294967296)
                   // (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                       ::BIGINT + 1) AS prio
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source, n_chars, prio,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY prio DESC, doc_id) AS rk
        FROM pri
    )
    SELECT source, doc_id, n_chars, prio, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_PS_K}
    """,
    tags=("llm", "sampling", "weighted"),
)
def priority_sample_per_source(spark, sf_dir):
    """Per-source priority sampling: a fixed-size (k=10) weighted
    without-replacement sample WITHIN each source, weight = n_chars —
    the per-domain quota sampler (every curation mixture caps each
    source; the global variant priority_sample_topk cannot guarantee
    any source survives). Same integer priority w*2^32/(h+1) with the
    md5 16-bit u, so membership and order replay bit-for-bit.

    Scale shape: scan-local priorities + ONE window partitioned by
    source (rank truncated at k) — the grouped top-k pattern
    (window_topk_per_group) on sampling priorities; no global sort,
    no broadcast.
    """
    docs = read_table(spark, sf_dir, "documents")
    h = hex16_hash(F.col("doc_id").cast("string"))
    pri = docs.select(
        "doc_id",
        "source",
        "n_chars",
        h.alias("_h"),
    ).select(
        "doc_id",
        "source",
        "n_chars",
        F.expr("(n_chars * 4294967296) div (_h + 1)").alias("prio"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("prio").desc(), "doc_id"
    )
    return (
        pri.select(
            "source",
            "doc_id",
            "n_chars",
            "prio",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .where(F.col("rk") <= _PS_K)
    )
