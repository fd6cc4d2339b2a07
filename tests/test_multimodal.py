"""Multimodal plumbing: binary payload + metadata struct + mapInPandas
feature extraction (deterministic fake decode — codecs absent here)."""

from __future__ import annotations

import pytest

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.operators import multimodal as MM


def test_attach_media_schema(spark, sf_dir):
    docs = MM.attach_media(read_table(spark, sf_dir, "documents"))
    assert dict(docs.dtypes)["media"] == "binary"
    meta_type = dict(docs.dtypes)["media_meta"]
    assert "media_type" in meta_type and "n_bytes" in meta_type


def test_extract_features_deterministic(spark, sf_dir):
    docs = MM.attach_media(read_table(spark, sf_dir, "documents"))
    a = {r["doc_id"]: r["features"] for r in MM.extract_features(docs).collect()}
    b = {r["doc_id"]: r["features"] for r in MM.extract_features(docs, batches=7).collect()}
    assert a == b  # partitioning must not change results
    assert all(len(v) == MM.FEATURE_DIM for v in a.values())


def test_features_match_python_reference(spark, sf_dir):
    docs = MM.attach_media(read_table(spark, sf_dir, "documents")).limit(5)
    rows = docs.select("doc_id", "text").collect()
    got = {r["doc_id"]: r["features"] for r in MM.extract_features(docs).collect()}
    for r in rows:
        assert got[r["doc_id"]] == MM._fake_features(r["text"].encode("utf-8"))


def test_decode_image_is_explicit_stub():
    with pytest.raises(NotImplementedError, match="codec"):
        MM.decode_image(b"\x89PNG")
