"""Multimodal queries: metadata projection and mapInPandas feature
extraction / resize / frame sampling — all oracled (the byte-stub
decode is exact integer math over an ASCII corpus, so even the Arrow
batch paths replay in SQL; the real-codec pillow tier is pytest-gated
instead, tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.operators import multimodal as MM
from pyspark_big_data_spark.queries.registry import register

_META_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS checksum,
       'image' AS media_type
FROM documents
ORDER BY doc_id
"""


@register("multimodal_metadata", oracle=_META_ORACLE)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only projection over media columns: never touches the
    binary payload (column pruning keeps payload IO at zero)."""
    docs = MM.attach_media(read_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.md5(F.col("text")).alias("checksum"),
        F.col("media_meta.media_type").alias("media_type"),
    ).orderBy("doc_id")


# The byte-stub features are exact integer arithmetic over the utf-8
# payload, and the corpus is pure ASCII (payload bytes == codepoints):
# n_bytes and the mean byte replay in SQL exactly — sum-of-ints / count
# is the identical double in both engines. The codec (pillow) tier,
# when present, is covered by tests/test_multimodal.py instead; this
# oracle pins the stub path the sandbox actually runs.
_FEATURES_ORACLE = """
WITH pos AS (
    SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
    FROM documents
)
SELECT doc_id, COUNT(*) AS n_bytes,
       ROUND(CAST(SUM(unicode(substr(text, CAST(i AS INTEGER), 1))) AS DOUBLE)
             / COUNT(*), 6) AS mean_byte
FROM pos GROUP BY doc_id ORDER BY doc_id
"""


@register("multimodal_feature_extract", oracle=_FEATURES_ORACLE, driver=False)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = MM.attach_media(read_table(spark, sf_dir, "documents"))
    # decoder pinned to the byte-stub so the oracle contract is
    # environment-independent (the pillow tier would emit pixel stats,
    # which have no SQL twin — that path is pytest-gated instead)
    feats = MM.extract_features(docs, decoder=MM._fake_features)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(F.element_at("features", 2), 6).alias("mean_byte"),
    ).orderBy("doc_id")


# The stub resize is nearest-neighbor indexing over the raw byte stream,
# and the corpus is pure ASCII (verified: max codepoint 121) — so the
# byte math replays over characters in SQL and the md5 checksums must
# agree bit-for-bit. In-repo parity gate only (driver surface is capped).
_RESIZE_W = 32
_RESIZE_H = 32
_RESIZE_ORACLE = f"""
SELECT doc_id,
       md5(string_agg(substr(text, (i * length(text)) // {_RESIZE_W * _RESIZE_H} + 1, 1),
                      '' ORDER BY i)) AS checksum
FROM documents, generate_series(0, {_RESIZE_W * _RESIZE_H - 1}) AS t(i)
GROUP BY doc_id
ORDER BY doc_id
"""


@register("multimodal_resize", oracle=_RESIZE_ORACLE, driver=False)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize every media payload to a fixed (W, H) via the Arrow batch
    path; checksum proves the resampled bytes, not just the plumbing."""
    docs = MM.attach_media(read_table(spark, sf_dir, "documents"))
    rz = MM.resize_media(docs, width=_RESIZE_W, height=_RESIZE_H)
    return rz.select("doc_id", F.md5(F.col("media")).alias("checksum")).orderBy("doc_id")


_FRAME_BYTES = 256
_FRAME_EVERY = 5
_FRAMES_ORACLE = f"""
WITH d AS (
    SELECT doc_id, text, (length(text) + {_FRAME_BYTES - 1}) // {_FRAME_BYTES} AS n_frames
    FROM documents
),
f AS (
    SELECT doc_id, n_frames,
           unnest(generate_series(0, n_frames - 1, {_FRAME_EVERY})) AS frame_idx
    FROM d
)
SELECT f.doc_id, f.frame_idx, f.n_frames,
       md5(substr(d.text, CAST(f.frame_idx * {_FRAME_BYTES} + 1 AS INTEGER), {_FRAME_BYTES})) AS checksum
FROM f JOIN d ON d.doc_id = f.doc_id
ORDER BY f.doc_id, f.frame_idx
"""


# ---------------------------------------------------------------------------
# REAL-decode tier: genuine binary PPM images (stdlib-decodable, no
# pillow needed) flow through the same extract_features / resize_media
# Arrow paths, and every derived statistic is exact integer math over
# the generated pixels — so the real decode is SQL-oracled, closing the
# "only the byte-stub is ever exercised" gap without new dependencies.
# Pixel contract (operators/multimodal.attach_ppm_media): w = 8+id%9,
# h = 8+id%7, grayscale v(j) = (id*31 + j) % 256 in all channels.
# ---------------------------------------------------------------------------

_REAL_FEATURES_ORACLE = """
WITH dims AS (
    SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents
), lum AS (
    SELECT doc_id, w, h, (doc_id * 31 + unnest(generate_series(0, w * h - 1))) % 256 AS v
    FROM dims
)
SELECT doc_id,
       CAST(ANY_VALUE(w) AS DOUBLE) AS width,
       CAST(ANY_VALUE(h) AS DOUBLE) AS height,
       ROUND(CAST(SUM(CASE WHEN v // 48 = 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS b0,
       ROUND(CAST(SUM(CASE WHEN v // 48 = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS b1,
       ROUND(CAST(SUM(CASE WHEN v // 48 = 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS b2,
       ROUND(CAST(SUM(CASE WHEN v // 48 = 3 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS b3,
       ROUND(CAST(SUM(CASE WHEN v // 48 = 4 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS b4,
       ROUND(CAST(SUM(CASE WHEN v // 48 >= 5 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS b5
FROM lum GROUP BY doc_id ORDER BY doc_id
"""


@register("multimodal_real_decode", oracle=_REAL_FEATURES_ORACLE, driver=False)
def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: binary PPM payloads through the
    default (format-sniffing) decoder — header parse, dimension read,
    per-pixel luminance histogram — all inside the Arrow batch path.
    The grayscale pixels make luma == pixel value, so the histogram
    replays exactly in SQL."""
    docs = MM.attach_ppm_media(read_table(spark, sf_dir, "documents"))
    feats = MM.extract_features(docs)  # default decoder: sniffs P6 -> real decode
    sel = [
        "doc_id",
        F.element_at("features", 1).alias("width"),
        F.element_at("features", 2).alias("height"),
    ]
    sel += [F.round(F.element_at("features", i + 3), 6).alias(f"b{i}") for i in range(6)]
    return feats.select(*sel).orderBy("doc_id")


_REAL_RESIZE_W = 8
_REAL_RESIZE_H = 8
# resized header 'P6\n8 8\n255\n' = 11 bytes + 3*64 raster = 203
_REAL_RESIZE_ORACLE = f"""
WITH dims AS (
    SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents
), outpx AS (
    SELECT doc_id, w, h, unnest(generate_series(0, {_REAL_RESIZE_W * _REAL_RESIZE_H - 1})) AS j
    FROM dims
), src AS (
    SELECT doc_id, j,
           (doc_id * 31 + ((((j // {_REAL_RESIZE_W}) * h) // {_REAL_RESIZE_H}) * w
                           + (((j % {_REAL_RESIZE_W}) * w) // {_REAL_RESIZE_W}))) % 256 AS v
    FROM outpx
)
SELECT doc_id,
       CAST(11 + 3 * {_REAL_RESIZE_W * _REAL_RESIZE_H} AS BIGINT) AS n_bytes,
       CAST(3 * SUM(v) AS BIGINT) AS pix_sum,
       CAST(SUM(v * (j + 1)) AS BIGINT) AS pix_wsum
FROM src GROUP BY doc_id ORDER BY doc_id
"""


@register("multimodal_real_resize", oracle=_REAL_RESIZE_ORACLE, driver=False)
def multimodal_real_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel resize end-to-end: PPM decode -> 2-D nearest-neighbor
    to {_REAL_RESIZE_W}x{_REAL_RESIZE_H} -> PPM re-encode, then pixel
    statistics decoded back off the resized payload. pix_wsum weights
    each output pixel by position, so a right-value-wrong-place resample
    fails the oracle."""
    import pandas as pd

    docs = MM.attach_ppm_media(read_table(spark, sf_dir, "documents"))
    rz = MM.resize_media(docs, width=_REAL_RESIZE_W, height=_REAL_RESIZE_H)

    def stats(batches):
        for pdf in batches:
            n_bytes, sums, wsums = [], [], []
            for payload in pdf["media"]:
                b = bytes(payload)
                w, h, rgb = MM.decode_ppm(b)
                n_bytes.append(len(b))
                sums.append(sum(rgb))
                wsums.append(sum(rgb[3 * j] * (j + 1) for j in range(w * h)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pd.Series(n_bytes, dtype="int64"),
                    "pix_sum": pd.Series(sums, dtype="int64"),
                    "pix_wsum": pd.Series(wsums, dtype="int64"),
                }
            )

    out = rz.mapInPandas(stats, schema="doc_id long, n_bytes long, pix_sum long, pix_wsum long")
    return out.orderBy("doc_id")


@register("multimodal_frame_sample", oracle=_FRAMES_ORACLE, driver=False)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-model frame sampling: fixed-size chunk frames, every 5th
    kept, fan-out inside the Arrow batch (no explode shuffle)."""
    docs = MM.attach_media(read_table(spark, sf_dir, "documents"), media_type="video")
    fr = MM.sample_frames(docs, frame_bytes=_FRAME_BYTES, every=_FRAME_EVERY)
    return fr.select(
        "doc_id", "frame_idx", "n_frames", F.md5(F.col("frame")).alias("checksum")
    ).orderBy("doc_id", "frame_idx")


# The audio fixture waveform is ((doc_id*131 + t*17) % 4096) - 2048 for
# t in 0..n-1, n = 800 + doc_id % 160 (operators/multimodal.py::
# wav_samples_for) — every statistic below replays in SQL over
# generate_series with exact integer arithmetic; only duration_ms is a
# double, and it is the same division in both engines.
_AUDIO_FEATURES_ORACLE = """
WITH dims AS (
    SELECT doc_id, 800 + doc_id % 160 AS n FROM documents
), smp AS (
    SELECT doc_id, n, t,
           (doc_id * 131 + t * 17) % 4096 - 2048 AS v,
           CASE WHEN t + 1 < n
                THEN (doc_id * 131 + (t + 1) * 17) % 4096 - 2048
           END AS v_next
    FROM (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS t FROM dims)
)
SELECT doc_id,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(ANY_VALUE(n) AS BIGINT) AS n_samples,
       ROUND(1000.0 * ANY_VALUE(n) / 8000, 6) AS duration_ms,
       CAST(SUM(v * v) AS BIGINT) AS sum_sq,
       CAST(MAX(abs(v)) AS BIGINT) AS peak,
       CAST(SUM(CASE WHEN v * v_next < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross
FROM smp GROUP BY doc_id ORDER BY doc_id
"""


@register("multimodal_audio_features", oracle=_AUDIO_FEATURES_ORACLE)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: PCM16 mono WAV payloads through the
    stdlib wave codec inside the Arrow batch path — container parse,
    sample extraction, integer energy/peak/zero-crossing statistics.
    The audio twin of multimodal_real_decode (PPM images)."""
    docs = MM.attach_wav_media(read_table(spark, sf_dir, "documents"))
    feats = MM.extract_audio_features(docs)
    return feats.select(
        "doc_id",
        "sample_rate",
        "n_samples",
        F.round("duration_ms", 6).alias("duration_ms"),
        "sum_sq",
        "peak",
        "zero_cross",
    ).orderBy("doc_id")


_AUDIO_TARGET_RATE = 4000
# out[j] = in[(j*n)//n_out], n_out = (n*4000)//8000 = n//2
_AUDIO_RESAMPLE_ORACLE = f"""
WITH dims AS (
    SELECT doc_id, 800 + doc_id % 160 AS n,
           (800 + doc_id % 160) * {_AUDIO_TARGET_RATE} // 8000 AS n_out
    FROM documents
), outs AS (
    SELECT doc_id, n, n_out, j,
           (doc_id * 131 + ((j * n) // n_out) * 17) % 4096 - 2048 AS v
    FROM (SELECT doc_id, n, n_out, unnest(generate_series(0, n_out - 1)) AS j FROM dims)
)
SELECT doc_id,
       CAST({_AUDIO_TARGET_RATE} AS BIGINT) AS sample_rate,
       CAST(ANY_VALUE(n_out) AS BIGINT) AS n_samples,
       CAST(SUM(v * v) AS BIGINT) AS sum_sq,
       CAST(SUM(v * (j + 1)) AS BIGINT) AS wsum
FROM outs GROUP BY doc_id ORDER BY doc_id
"""


@register("multimodal_audio_resample", oracle=_AUDIO_RESAMPLE_ORACLE, driver=False)
def multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio resample end-to-end: WAV decode -> integer
    nearest-neighbor to {_AUDIO_TARGET_RATE} Hz -> WAV re-encode, then
    statistics decoded back off the RESAMPLED payload. wsum weights each
    output sample by position, so right-values-wrong-order fails the
    oracle (same trick as multimodal_real_resize)."""
    import pandas as pd

    docs = MM.attach_wav_media(read_table(spark, sf_dir, "documents"))
    rz = MM.resample_audio(docs, target_rate=_AUDIO_TARGET_RATE)

    def stats(batches):
        import numpy as np

        for pdf in batches:
            rates, ns, sums, wsums = [], [], [], []
            for payload in pdf["media"]:
                rate, n, s = MM.decode_wav(bytes(payload))
                s64 = s.astype(np.int64)
                rates.append(rate)
                ns.append(n)
                sums.append(int((s64 * s64).sum()))
                wsums.append(int((s64 * (np.arange(n, dtype=np.int64) + 1)).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "sample_rate": pd.Series(rates, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "sum_sq": pd.Series(sums, dtype="int64"),
                    "wsum": pd.Series(wsums, dtype="int64"),
                }
            )

    out = rz.select("doc_id", "media").mapInPandas(
        stats, schema="doc_id long, sample_rate long, n_samples long, sum_sq long, wsum long"
    )
    return out.orderBy("doc_id")


_VIDEO_EVERY = 2
# fixture: 3 + d%5 frames of 4x4 grayscale; frame f pixel j value
# (d*31 + f*97 + j) % 256; sampler keeps frames 0, 2, 4, ...
# each PPM frame = 'P6\n4 4\n255\n' (11 bytes) + 48 raster = 59 bytes
_VIDEO_ORACLE = f"""
WITH dims AS (
    SELECT doc_id, 3 + doc_id % 5 AS n_frames FROM documents
), kept AS (
    SELECT doc_id, n_frames, unnest(generate_series(0, n_frames - 1, {_VIDEO_EVERY})) AS f
    FROM dims
), px AS (
    SELECT doc_id, n_frames, f,
           (doc_id * 31 + f * 97 + unnest(generate_series(0, 15))) % 256 AS v
    FROM kept
)
SELECT doc_id, f AS frame_idx,
       CAST(ANY_VALUE(n_frames) AS BIGINT) AS n_frames,
       CAST(59 AS BIGINT) AS frame_bytes,
       CAST(3 * SUM(v) AS BIGINT) AS pix_sum
FROM px GROUP BY doc_id, f ORDER BY doc_id, frame_idx
"""


@register("multimodal_video_frames", oracle=_VIDEO_ORACLE)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container path end-to-end: concatenated-PPM clips
    demuxed by header parsing (operators/multimodal.py::
    split_ppm_stream — a genuine per-frame length computation, not
    byte chunking), every {_VIDEO_EVERY}nd frame kept, and each KEPT
    frame decoded for pixel statistics. Completes the real-codec story
    across all three modalities (PPM images, WAV audio, PPM-stream
    video) with stdlib only."""
    import pandas as pd

    docs = MM.attach_ppm_video(read_table(spark, sf_dir, "documents"))
    frames = MM.sample_frames(docs, every=_VIDEO_EVERY, splitter=MM.split_ppm_stream)

    def stats(batches):
        for pdf in batches:
            n_bytes, sums = [], []
            for payload in pdf["frame"]:
                b = bytes(payload)
                _, _, rgb = MM.decode_ppm(b)
                n_bytes.append(len(b))
                sums.append(sum(rgb))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "frame_idx": pdf["frame_idx"].astype("int64"),
                    "n_frames": pdf["n_frames"].astype("int64"),
                    "frame_bytes": pd.Series(n_bytes, dtype="int64"),
                    "pix_sum": pd.Series(sums, dtype="int64"),
                }
            )

    out = frames.mapInPandas(
        stats,
        schema="doc_id long, frame_idx long, n_frames long, frame_bytes long, pix_sum long",
    )
    return out.orderBy("doc_id", "frame_idx")
