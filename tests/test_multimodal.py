"""Multimodal plumbing tests: binary payload column through Arrow-batched
mapInPandas feature extraction."""

from __future__ import annotations

import hashlib

import pytest

from tvbigdataproject_spark.operators.multimodal import (
    attach_fake_payload,
    decode_image,
    extract_features,
)
from tvbigdataproject_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_extract_features_ground_truth(spark):
    docs = read_table(spark, SF_DIR, "documents").limit(5)
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    out = {r["doc_id"]: r for r in extract_features(attach_fake_payload(docs)).collect()}
    assert set(out) == set(src)
    for doc_id, text in src.items():
        payload = text.encode("utf-8")
        row = out[doc_id]
        assert row["n_bytes"] == len(payload)
        assert row["sha256"] == hashlib.sha256(payload).hexdigest()
        d = hashlib.sha256(payload).digest()
        assert row["width"] == (d[0] << 8 | d[1]) % 640
        assert row["height"] == (d[2] << 8 | d[3]) % 480
        assert 0 <= row["width"] < 640 and 0 <= row["height"] < 480


def test_feature_schema_is_declared(spark):
    docs = read_table(spark, SF_DIR, "documents").limit(1)
    df = extract_features(attach_fake_payload(docs))
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,media_type:string,n_bytes:bigint,"
        "sha256:string,width:int,height:int>"
    )


def test_real_decoder_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
