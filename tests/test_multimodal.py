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


def test_resize_media_stub_matches_python(spark, sf_dir):
    docs = MM.attach_media(read_table(spark, sf_dir, "documents")).limit(8)
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    out = {r["doc_id"]: r for r in MM.resize_media(docs, width=4, height=3).collect()}
    assert set(out) == set(texts)
    for doc_id, text in texts.items():
        expect = MM._stub_resize(text.encode("utf-8"), 4, 3)
        row = out[doc_id]
        assert bytes(row["media"]) == expect
        assert len(expect) == 12
        assert row["media_meta"]["width"] == 4 and row["media_meta"]["height"] == 3
        assert row["media_meta"]["format"] == "resized"


def test_resize_media_partitioning_invariant(spark, sf_dir):
    docs = MM.attach_media(read_table(spark, sf_dir, "documents"))
    a = {r["doc_id"]: bytes(r["media"]) for r in MM.resize_media(docs, batches=3).collect()}
    b = {r["doc_id"]: bytes(r["media"]) for r in MM.resize_media(docs, batches=17).collect()}
    assert a == b


def test_resize_media_injected_resizer(spark, sf_dir):
    docs = MM.attach_media(read_table(spark, sf_dir, "documents")).limit(5)

    def reverse_resizer(payload: bytes, w: int, h: int) -> bytes:
        return payload[::-1][: w * h]

    out = MM.resize_media(docs, width=2, height=2, resizer=reverse_resizer)
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    for r in out.collect():
        assert bytes(r["media"]) == texts[r["doc_id"]].encode("utf-8")[::-1][:4]


def test_sample_frames_chunk_math(spark, sf_dir):
    frame_bytes, every = 64, 3
    docs = MM.attach_media(
        read_table(spark, sf_dir, "documents"), media_type="video"
    ).limit(10)
    texts = {r["doc_id"]: r["text"].encode("utf-8") for r in docs.select("doc_id", "text").collect()}
    rows = MM.sample_frames(docs, frame_bytes=frame_bytes, every=every).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, payload in texts.items():
        n_frames = max((len(payload) + frame_bytes - 1) // frame_bytes, 1)
        expect_idx = list(range(0, n_frames, every))
        got = sorted(by_doc[doc_id], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in got] == expect_idx
        assert all(r["n_frames"] == n_frames for r in got)
        for r in got:
            start = r["frame_idx"] * frame_bytes
            assert bytes(r["frame"]) == payload[start : start + frame_bytes]


def test_sample_frames_injected_splitter(spark, sf_dir):
    docs = MM.attach_media(read_table(spark, sf_dir, "documents")).limit(3)

    def two_halves(payload: bytes) -> list[bytes]:
        mid = len(payload) // 2
        return [payload[:mid], payload[mid:]]

    rows = MM.sample_frames(docs, every=1, splitter=two_halves).collect()
    assert all(r["n_frames"] == 2 for r in rows)
    assert sorted({r["frame_idx"] for r in rows}) == [0, 1]
