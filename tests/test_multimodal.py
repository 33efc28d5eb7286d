"""Multimodal plumbing tests: binary schema, mapInPandas batch shape,
deterministic fake decode, and stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructType

from firmable_company_data_pipeline_spark.operators import multimodal as mm
from firmable_company_data_pipeline_spark.session import load_tables


def test_media_table_schema(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = mm.as_media_table(docs)
    schema = {f.name: f.dataType for f in media.schema.fields}
    assert isinstance(schema["content"], BinaryType)
    assert isinstance(schema["meta"], StructType)
    row = media.limit(1).collect()[0]
    assert isinstance(row.content, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.content)


def test_extract_features_matches_python(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"].limit(50)
    feats = mm.extract_features(mm.as_media_table(docs))
    got = {r.media_id: r for r in feats.collect()}
    for row in docs.collect():
        raw = row.text.encode("utf-8")
        f = got[row.doc_id]
        assert f.n_bytes == len(raw)
        assert f.first_byte == raw[0]
        assert f.byte_sum_mod == sum(raw) % mm.HASH_MOD


def test_feature_schema_stable(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    feats = mm.extract_features(mm.as_media_table(docs))
    assert feats.schema == mm.FEATURE_SCHEMA


def test_decode_stub_gated():
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x89PNG", "image/png")
    assert mm.decode_media(b"abc", "image/png", fake=True) == b"abc"


def test_resize_and_frames_stubbed(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = mm.as_media_table(docs)
    with pytest.raises(NotImplementedError):
        mm.resize_image(media, 224, 224)
    with pytest.raises(NotImplementedError):
        mm.sample_frames(media)
