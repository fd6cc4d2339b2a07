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


def test_real_decode_features_via_ppm():
    """The REAL decode path runs in every environment via the stdlib PPM
    codec — no pillow, no skip. A known 2x2 image must produce exact
    dimensions and luminance-bucket mass."""
    # pixels: black, mid-gray 100, white, red
    rgb = bytes([0, 0, 0, 100, 100, 100, 255, 255, 255, 255, 0, 0])
    payload = MM.encode_ppm(2, 2, rgb)
    feats = MM._auto_features(payload)  # default decoder must sniff P6
    assert feats[:2] == [2.0, 2.0]
    # luma: 0 -> bucket 0; 100 -> bucket 2; 255 -> bucket 5; red luma
    # (299*255)//1000 = 76 -> bucket 1
    assert feats[2:] == [0.25, 0.25, 0.25, 0.0, 0.0, 0.25]
    assert len(feats) == MM.FEATURE_DIM
    if MM.codec_available():  # pillow agrees on the same pixels (PNG form)
        import io

        from PIL import Image

        img = Image.frombytes("RGB", (2, 2), rgb)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        assert MM._image_features(buf.getvalue()) == feats


def test_ppm_codec_roundtrip_and_corruption():
    rgb = bytes(range(27))  # 3x3
    payload = MM.encode_ppm(3, 3, rgb)
    assert MM.decode_ppm(payload) == (3, 3, rgb)
    # comments + extra whitespace in the header are legal netpbm
    commented = b"P6\n# made by a test\n 3\t3 # dims\n255\n" + rgb
    assert MM.decode_ppm(commented) == (3, 3, rgb)
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_ppm(payload[:-1])
    with pytest.raises(ValueError, match="P6"):
        MM.decode_ppm(b"\x89PNG....")


def test_ppm_resize_real_pixels():
    """Nearest-neighbor on decoded pixels: 2x2 -> 1x1 keeps the top-left
    pixel; 2x1 -> 4x1 repeats each source pixel twice."""
    rgb = bytes([10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40])
    small = MM._ppm_resize(MM.encode_ppm(2, 2, rgb), 1, 1)
    assert MM.decode_ppm(small) == (1, 1, bytes([10, 10, 10]))
    wide = MM._ppm_resize(MM.encode_ppm(2, 1, rgb[:6]), 4, 1)
    assert MM.decode_ppm(wide)[2] == bytes([10, 10, 10, 10, 10, 10, 20, 20, 20, 20, 20, 20])


def test_attach_ppm_media_generates_decodable_images(spark, sf_dir):
    docs = MM.attach_ppm_media(read_table(spark, sf_dir, "documents")).limit(10)
    for r in docs.collect():
        d = r["doc_id"]
        w, h, rgb = MM.decode_ppm(bytes(r["media"]))
        assert (w, h) == (8 + d % 9, 8 + d % 7)
        # grayscale contract: v(j) = (id*31 + j) % 256 in all channels
        for j in (0, w * h - 1):
            v = (d * 31 + j) % 256
            assert rgb[3 * j : 3 * j + 3] == bytes([v, v, v])


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


def test_wav_roundtrip_matches_fixture_formula():
    import numpy as np

    for d in (0, 7, 123, 4096):
        s = MM.wav_samples_for(d)
        rate, n, decoded = MM.decode_wav(MM.encode_wav(s))
        assert rate == MM.WAV_RATE
        assert n == 800 + d % 160
        assert np.array_equal(decoded.astype(np.int64), s)


def test_wav_rejects_non_pcm16_mono():
    import io
    import wave

    import numpy as np
    import pytest as _pytest

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)  # stereo — must be rejected
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.zeros(32, dtype="<i2").tobytes())
    with _pytest.raises(ValueError, match="PCM16 mono"):
        MM.decode_wav(buf.getvalue())


def test_resample_wav_index_math():
    import numpy as np

    s = MM.wav_samples_for(42)
    n = len(s)
    out = MM.resample_wav(MM.encode_wav(s), target_rate=4000)
    rate, n_out, decoded = MM.decode_wav(out)
    assert rate == 4000
    assert n_out == (n * 4000) // 8000
    expect = s[[(j * n) // n_out for j in range(n_out)]]
    assert np.array_equal(decoded.astype(np.int64), expect)


def test_audio_features_match_local_decode(spark, sf_dir):
    import numpy as np

    docs = MM.attach_wav_media(read_table(spark, sf_dir, "documents").limit(20))
    rows = {r["doc_id"]: r for r in MM.extract_audio_features(docs).collect()}
    assert len(rows) == 20
    for doc_id, r in rows.items():
        s = MM.wav_samples_for(doc_id).astype(np.int64)
        assert r["sum_sq"] == int((s * s).sum())
        assert r["peak"] == int(np.abs(s).max())
        assert r["zero_cross"] == int(((s[:-1] * s[1:]) < 0).sum())


def test_split_ppm_stream_real_demux():
    import numpy as np
    import pytest as _pytest

    # two frames of different sizes — byte-chunking cannot split this
    f1 = MM.encode_ppm(3, 2, bytes(range(18)))
    v = np.arange(48, dtype=np.uint8)
    f2 = MM.encode_ppm(4, 4, v.tobytes())
    frames = MM.split_ppm_stream(f1 + f2)
    assert frames == [f1, f2]
    # truncated second frame must fail, never emit a partial frame
    with _pytest.raises(ValueError, match="truncated"):
        MM.split_ppm_stream(f1 + f2[:-5])


def test_attach_ppm_video_roundtrip(spark, sf_dir):
    docs = MM.attach_ppm_video(read_table(spark, sf_dir, "documents").limit(10))
    for r in docs.collect():
        frames = MM.split_ppm_stream(bytes(r["media"]))
        assert len(frames) == MM.video_frame_count_for(r["doc_id"])
        for f, frame in enumerate(frames):
            w, h, rgb = MM.decode_ppm(frame)
            assert (w, h) == (4, 4)
            d = r["doc_id"]
            expect = [(d * 31 + f * 97 + j) % 256 for j in range(16)]
            assert [rgb[3 * j] for j in range(16)] == expect
