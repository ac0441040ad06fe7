"""Multimodal plumbing query: binary payload column → mapInPandas
feature extraction (operators/multimodal.py), oracle-checked at the
byte level (size, sha256, digest-derived stub dimensions)."""

from __future__ import annotations

from tvbigdataproject_spark.operators.multimodal import attach_fake_payload, extract_features
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "multimodal_features",
    sql="""
    SELECT doc_id,
           'image/fake' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256,
           CAST(('0x' || substr(sha256(text), 1, 4))::BIGINT % 640 AS INTEGER) AS width,
           CAST(('0x' || substr(sha256(text), 5, 4))::BIGINT % 480 AS INTEGER) AS height
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_features(spark, sf_dir):
    """documents → fake binary payload → Arrow-batched feature extraction.

    The one deliberate Python stage in the suite: mapInPandas with a
    declared schema, exercising the exact plumbing a real image decoder
    would use (see operators/multimodal.py for the decode stub contract).
    """
    docs = read_table(spark, sf_dir, "documents")
    return extract_features(attach_fake_payload(docs))
