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


def test_decode_gate_matches_environment():
    # with pillow installed decode_image works; without, it raises the
    # explicit NotImplementedError (never a silent wrong answer)
    if MM.codec_available():
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("L", (4, 3), color=128).save(buf, format="PNG")
        img = MM.decode_image(buf.getvalue())
        assert img.size == (4, 3)
    else:
        with pytest.raises(NotImplementedError, match="codec"):
            MM.decode_image(b"\x89PNG")


def test_injected_decoder_drives_codec_path(spark, sf_dir):
    # the decoder seam is how a real codec plugs in: verify an injected
    # callable flows through the Arrow batches with identical schema
    docs = MM.attach_media(read_table(spark, sf_dir, "documents")).limit(10)

    def length_decoder(payload: bytes) -> list[float]:
        return [float(len(payload))] * MM.FEATURE_DIM

    out = MM.extract_features(docs, decoder=length_decoder)
    assert out.schema == MM.FEATURES_SCHEMA
    for r in out.collect():
        assert r["features"] == [float(r["n_bytes"])] * MM.FEATURE_DIM


def test_image_features_shape_when_codec_present():
    if not MM.codec_available():
        pytest.skip("pillow not installed in this container")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (8, 8), color=200).save(buf, format="PNG")
    feats = MM._image_features(buf.getvalue())
    assert len(feats) == MM.FEATURE_DIM and feats[0] == 8.0 and feats[1] == 8.0
