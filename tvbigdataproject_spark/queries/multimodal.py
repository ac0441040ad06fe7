"""Multimodal plumbing query: binary payload column → mapInPandas
feature extraction (operators/multimodal.py), oracle-checked at the
byte level (size, sha256, digest-derived stub dimensions)."""

from __future__ import annotations

from tvbigdataproject_spark.operators.multimodal import (
    attach_fake_payload,
    extract_features,
    resize_images,
    sample_frames,
)
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


@query(
    "multimodal_resize",
    sql="""
    WITH feat AS (
        SELECT doc_id,
               CAST(('0x' || substr(sha256(text), 1, 4))::BIGINT % 640 AS INTEGER) AS width,
               CAST(('0x' || substr(sha256(text), 5, 4))::BIGINT % 480 AS INTEGER) AS height
        FROM documents
    )
    SELECT doc_id, 'image/fake' AS media_type, width, height,
           CASE WHEN greatest(width, height) <= 256 THEN width
                ELSE CAST(width * 256 // greatest(width, height) AS INTEGER) END AS new_width,
           CASE WHEN greatest(width, height) <= 256 THEN height
                ELSE CAST(height * 256 // greatest(width, height) AS INTEGER) END AS new_height
    FROM feat
    """,
    tags=("multimodal",),
)
def multimodal_resize(spark, sf_dir):
    """Aspect-preserving thumbnail sizing through the resize mapInPandas
    stage — integer-arithmetic dims the oracle replays exactly; a real
    deployment swaps the stub decode for PIL/cv2 and nothing else
    changes (operators/multimodal.py)."""
    docs = read_table(spark, sf_dir, "documents")
    return resize_images(attach_fake_payload(docs), max_dim=256)


@query(
    "multimodal_frame_sample",
    sql="""
    WITH f AS (
        SELECT doc_id, text, octet_length(encode(text)) // 16 AS n_frames
        FROM documents
    )
    SELECT doc_id, i AS frame_idx,
           sha256(substr(text, CAST(i * 16 + 1 AS BIGINT), 16)) AS frame_sha
    FROM f, UNNEST(range(0, n_frames, 4)) AS t(i)
    """,
    tags=("multimodal", "video"),
)
def multimodal_frame_sample(spark, sf_dir):
    """Fake-video frame sampling: payload → every-4th 16-byte frame →
    per-frame digest, via the explode-in-Python mapInPandas stage a real
    ffmpeg sampler would occupy. The oracle slices the same bytes in SQL
    (corpus is ASCII, so char slicing == byte slicing — asserted in the
    multimodal tests)."""
    docs = read_table(spark, sf_dir, "documents")
    return sample_frames(attach_fake_payload(docs), frame_bytes=16, every=4)
