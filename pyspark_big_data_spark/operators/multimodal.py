"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Convention (schemas.py::MEDIA_META): media travels as a BinaryType
column beside a metadata struct; compute-heavy decode/transform runs as
Arrow-batched mapInPandas over bounded-size batches.

Decode is FEATURE-GATED: when pillow is importable, `decode_image`
really decodes and `extract_features` derives pixel statistics; in
codec-less containers (like this one) the deterministic byte-stub
fallback keeps tests real end-to-end through the Spark plumbing —
schema, batching, partitioning are identical either way. A custom
``decoder`` callable can also be injected (that's how the codec path
itself is tested without pillow).

Scale notes: binary payloads make rows wide — the layer repartitions by
target batch count before mapInPandas so a single executor never holds
too many payloads, and metadata-only queries never touch the payload
column (column pruning keeps binary IO at zero).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

try:  # feature gate: real image decode only when a codec lib exists
    from PIL import Image as _PILImage  # type: ignore[import-not-found]
except ImportError:
    _PILImage = None

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text", media_type: str = "image") -> DataFrame:
    """Attach a synthetic binary payload + metadata struct to each row.

    Stand-in for reading real media (binaryFile source / object-store
    fetch); payload = utf-8 bytes of the text column, deterministic.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit("raw").alias("format"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return df.withColumn("media", payload).withColumn("media_meta", meta)


def codec_available() -> bool:
    return _PILImage is not None


def attach_ppm_media(df: DataFrame, id_col: str = "doc_id", batches: int = 32) -> DataFrame:
    """Attach a deterministic REAL image (binary PPM) per row: width
    8 + id % 9, height 8 + id % 7, grayscale pixel j has value
    (id * 31 + j) % 256 in all three channels. Stand-in for an
    object-store image fetch that still produces genuine decodable
    images, with pixel content fully derivable in SQL (the oracle
    contract for the real-decode queries)."""

    def run(batches_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches_iter:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                w, h = 8 + d % 9, 8 + d % 7
                v = (d * 31 + np.arange(w * h, dtype=np.int64)) % 256
                rgb = np.repeat(v.astype(np.uint8), 3).tobytes()
                payloads.append(encode_ppm(w, h, rgb))
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "media": payloads})

    narrow = df.select(id_col).repartition(batches)
    return narrow.mapInPandas(run, schema="doc_id long, media binary")


def decode_image(payload: bytes):
    """Decode an image payload to a PIL image (requires pillow)."""
    if _PILImage is None:
        raise NotImplementedError(
            "image decode requires pillow/opencv; plug a codec into "
            "extract_features(decoder=...) when available"
        )
    import io

    img = _PILImage.open(io.BytesIO(payload))
    img.load()
    return img


def _image_features(payload: bytes) -> list[float]:
    """Real features via the codec: dimensions + coarse luminance
    histogram mass. Same FEATURE_DIM shape as the byte-stub fallback."""
    img = decode_image(payload).convert("L")
    w, h = img.size
    hist = img.histogram()  # 256 luminance bins
    n = max(w * h, 1)
    feats = [float(w), float(h)]
    for lo in range(0, 256, 48):  # 6 coarse buckets, mirrors the stub
        feats.append(sum(hist[lo : lo + 48]) / n)
    return feats[:FEATURE_DIM]


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in features: byte-distribution statistics."""
    if not payload:
        return [0.0] * FEATURE_DIM
    n = len(payload)
    mean = sum(payload) / n
    feats = [float(n), mean]
    # bucketed byte histogram mass (6 coarse buckets)
    for lo in range(0, 256, 48):
        feats.append(sum(1 for b in payload if lo <= b < lo + 48) / n)
    return feats[:FEATURE_DIM]


# ---------------------------------------------------------------------------
# Pure-stdlib PPM (P6) codec: a REAL image format this container can
# decode without pillow. PPM is the simplest widely-understood raster
# format (netpbm); supporting it makes the decode path exercise real
# header parsing + pixel math end-to-end, with the byte-stub retained
# for opaque/raw payloads. Integer arithmetic only — every derived
# statistic has an exact SQL twin (the driver-oracle contract).
# ---------------------------------------------------------------------------

PPM_MAGIC = b"P6"


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary-PPM encode: 'P6\\n{w} {h}\\n255\\n' + raw RGB triplets."""
    if len(rgb) != 3 * width * height:
        raise ValueError(f"PPM payload needs {3 * width * height} bytes, got {len(rgb)}")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def _ppm_header(payload: bytes) -> tuple[int, int, int]:
    """Parse a P6 header: returns (width, height, raster_offset).

    Handles arbitrary header whitespace and '#' comments per the netpbm
    spec; rejects non-255 maxval loudly."""
    if not payload.startswith(PPM_MAGIC):
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    idx = 2
    while len(fields) < 3:
        while idx < len(payload) and payload[idx : idx + 1].isspace():
            idx += 1
        if payload[idx : idx + 1] == b"#":
            while idx < len(payload) and payload[idx] != 0x0A:
                idx += 1
            continue
        start = idx
        while idx < len(payload) and not payload[idx : idx + 1].isspace():
            idx += 1
        fields.append(int(payload[start:idx]))
    idx += 1  # exactly one whitespace byte separates maxval from raster
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    return w, h, idx


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM: returns (width, height, rgb bytes).

    Rejects truncated pixel data loudly — a corrupt image must fail,
    never produce silent wrong features."""
    w, h, idx = _ppm_header(payload)
    rgb = payload[idx : idx + 3 * w * h]
    if len(rgb) != 3 * w * h:
        raise ValueError("truncated PPM raster")
    return w, h, rgb


def _ppm_features(payload: bytes) -> list[float]:
    """Real decoded-pixel features for PPM payloads: dimensions + coarse
    luminance histogram mass — the same FEATURE_DIM contract (and the
    same integer ITU-R 601 luma PIL's convert('L') uses), computed by
    the stdlib decoder so it runs in codec-less containers."""
    w, h, rgb = decode_ppm(payload)
    n = w * h
    hist = [0] * 6
    for j in range(n):
        r, g, b = rgb[3 * j], rgb[3 * j + 1], rgb[3 * j + 2]
        lum = (299 * r + 587 * g + 114 * b) // 1000
        hist[min(lum // 48, 5)] += 1
    return ([float(w), float(h)] + [c / n for c in hist])[:FEATURE_DIM]


def _auto_features(payload: bytes) -> list[float]:
    """Default decoder: REAL decode for payloads in a format this
    environment can decode (PPM via stdlib always; other raster formats
    via pillow when importable), byte-stub statistics for opaque/raw
    payloads. PPM deliberately uses the stdlib path even when pillow is
    present so the output is environment-independent (oracle-able)."""
    if payload.startswith(PPM_MAGIC):
        return _ppm_features(payload)
    if codec_available() and payload[:4] in (b"\x89PNG", b"\xff\xd8\xff\xe0", b"\xff\xd8\xff\xe1"):
        return _image_features(payload)
    return _fake_features(payload)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType()),
                    T.StructField("format", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _stub_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic nearest-neighbor downsample of the raw byte stream
    to exactly width*height bytes — the codec-less stand-in for a pixel
    resize (same index math a 1-D nearest-neighbor resampler uses)."""
    n_out = width * height
    n_in = len(payload)
    if n_in == 0:
        return bytes(n_out)
    return bytes(payload[(i * n_in) // n_out] for i in range(n_out))


def _pil_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real codec path: decode, resize, re-encode PNG (requires pillow)."""
    import io

    img = decode_image(payload).resize((width, height))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _ppm_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real 2-D nearest-neighbor resize on decoded PPM pixels, re-encoded
    as PPM. Pure integer index math — deterministic in every environment
    and exactly replayable in SQL."""
    w, h, rgb = decode_ppm(payload)
    out = bytearray()
    for y in range(height):
        sy = (y * h) // height
        for x in range(width):
            sx = (x * w) // width
            j = 3 * (sy * w + sx)
            out += rgb[j : j + 3]
    return encode_ppm(width, height, bytes(out))


def _auto_resize(payload: bytes, width: int, height: int) -> bytes:
    """Default resizer: real pixel resize for PPM payloads (stdlib, even
    with pillow present — keeps output environment-independent), pillow
    for other raster formats when importable, byte-stream stub for
    opaque/raw payloads."""
    if payload.startswith(PPM_MAGIC):
        return _ppm_resize(payload, width, height)
    if codec_available() and payload[:4] in (b"\x89PNG", b"\xff\xd8\xff\xe0", b"\xff\xd8\xff\xe1"):
        return _pil_resize(payload, width, height)
    return _stub_resize(payload, width, height)


def resize_media(
    df: DataFrame,
    width: int = 32,
    height: int = 32,
    id_col: str = "doc_id",
    media_col: str = "media",
    batches: int = 32,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """mapInPandas media resize: payload -> fixed (width, height) with
    the metadata struct rewritten to match.

    Resolution order mirrors ``extract_features``: explicit ``resizer``
    > format-sniffing default (_auto_resize: stdlib PPM pixels, pillow
    raster formats, byte-stub for raw payloads). Output schema is
    identical on every path, so downstream plans never depend on which
    codec was present at runtime.
    """
    if resizer is None:
        resizer = _auto_resize

    def run(batches_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches_iter:
            resized = pdf[media_col].map(lambda p: resizer(p, width, height))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media": resized,
                    "media_meta": [
                        {
                            "media_type": "image",
                            "format": "resized",
                            "n_bytes": len(p),
                            "width": width,
                            "height": height,
                            "duration_ms": None,
                        }
                        for p in resized
                    ],
                }
            )

    narrow = df.select(id_col, media_col).repartition(batches)
    return narrow.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 256,
    every: int = 5,
    id_col: str = "doc_id",
    media_col: str = "media",
    batches: int = 32,
    splitter: Callable[[bytes], list[bytes]] | None = None,
) -> DataFrame:
    """Frame sampling for video-typed payloads: split each payload into
    frames, keep every ``every``-th, one output row per kept frame.

    Without a container demuxer in the environment, the default
    ``splitter`` treats the payload as fixed-size ``frame_bytes`` chunks
    (a raw/uncompressed-stream model); a real demuxer (pyav/ffmpeg)
    plugs in via ``splitter`` with no plan change. The fan-out happens
    inside the Arrow batch (one input row -> ceil(n_frames/every) output
    rows), so no explode/shuffle is needed.
    """
    if splitter is None:

        def splitter(p: bytes) -> list[bytes]:
            return [p[i : i + frame_bytes] for i in range(0, len(p), frame_bytes)] or [b""]

    def run(batches_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches_iter:
            ids, idxs, totals, frames = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                fr = splitter(payload)
                for j in range(0, len(fr), every):
                    ids.append(int(doc_id))
                    idxs.append(j)
                    totals.append(len(fr))
                    frames.append(fr[j])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "n_frames": pd.Series(totals, dtype="int64"),
                    "frame": frames,
                }
            )

    narrow = df.select(id_col, media_col).repartition(batches)
    return narrow.mapInPandas(run, schema=FRAMES_SCHEMA)


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    batches: int = 32,
    decoder: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched; repartitioned so payload batches stay bounded.
    ``decoder`` resolution: explicit callable > format-sniffing default
    (_auto_features: real stdlib decode for PPM, pillow for other raster
    formats, byte-stub for raw payloads). Every path produces the same
    FEATURES_SCHEMA, so downstream plans are identical with or without
    codecs installed.
    """
    if decoder is None:
        decoder = _auto_features

    def run(batches_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches_iter:
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[media_col].map(len).astype("int64"),
                    "features": pdf[media_col].map(decoder),
                }
            )
            yield out

    narrow = df.select(id_col, media_col).repartition(batches)
    return narrow.mapInPandas(run, schema=FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Pure-stdlib WAV (PCM16 mono) codec: the AUDIO modality's real decode
# path, symmetric to the PPM tier for images. The `wave` module ships
# with CPython, so header parse + sample math run in codec-less
# containers; every derived statistic is integer arithmetic with an
# exact SQL twin.
# ---------------------------------------------------------------------------

WAV_RATE = 8000  # synthetic fixture sample rate (PCM16 mono)


def encode_wav(samples, rate: int = WAV_RATE) -> bytes:
    """PCM16 mono WAV encode via the stdlib wave module."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """Parse a PCM16 mono WAV: returns (rate, n_samples, int16 ndarray).

    Rejects stereo/non-16-bit payloads loudly — corrupt audio must fail,
    never produce silent wrong features (same contract as decode_ppm)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("only PCM16 mono WAV supported")
        rate = w.getframerate()
        n = w.getnframes()
        samples = np.frombuffer(w.readframes(n), dtype="<i2")
    return rate, n, samples


def wav_samples_for(doc_id: int):
    """The synthetic fixture waveform for a doc: n = 800 + id % 160
    samples of ((id * 131 + t * 17) % 4096) - 2048 — a deterministic
    sawtooth whose every statistic is derivable in SQL (the oracle
    contract, like attach_ppm_media's pixels)."""
    import numpy as np

    d = int(doc_id)
    n = 800 + d % 160
    t = np.arange(n, dtype=np.int64)
    return ((d * 131 + t * 17) % 4096) - 2048


def attach_wav_media(df: DataFrame, id_col: str = "doc_id", batches: int = 32) -> DataFrame:
    """Attach a deterministic REAL audio clip (PCM16 mono WAV) per row —
    the object-store-audio-fetch stand-in that still produces genuine
    decodable WAV containers."""

    def run(batches_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches_iter:
            payloads = [encode_wav(wav_samples_for(d)) for d in pdf[id_col]]
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "media": payloads})

    narrow = df.select(id_col).repartition(batches)
    return narrow.mapInPandas(run, schema="doc_id long, media binary")


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("zero_cross", T.LongType()),
    ]
)


def _wav_feature_row(payload: bytes) -> tuple:
    """Integer-exact audio statistics off the decoded samples: energy
    (sum of squares), peak amplitude, strict zero crossings."""
    import numpy as np

    rate, n, s = decode_wav(payload)
    s64 = s.astype(np.int64)
    sum_sq = int((s64 * s64).sum())
    peak = int(np.abs(s64).max()) if n else 0
    zc = int(((s64[:-1] * s64[1:]) < 0).sum()) if n > 1 else 0
    return rate, n, 1000.0 * n / rate, sum_sq, peak, zc


def extract_audio_features(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media", batches: int = 32
) -> DataFrame:
    """mapInPandas audio feature extraction: REAL WAV decode per payload
    inside the Arrow batch (stdlib codec — runs everywhere)."""

    def run(batches_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches_iter:
            rows = [_wav_feature_row(bytes(p)) for p in pdf[media_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "sample_rate": pd.Series([r[0] for r in rows], dtype="int64"),
                    "n_samples": pd.Series([r[1] for r in rows], dtype="int64"),
                    "duration_ms": pd.Series([r[2] for r in rows], dtype="float64"),
                    "sum_sq": pd.Series([r[3] for r in rows], dtype="int64"),
                    "peak": pd.Series([r[4] for r in rows], dtype="int64"),
                    "zero_cross": pd.Series([r[5] for r in rows], dtype="int64"),
                }
            )

    narrow = df.select(id_col, media_col).repartition(batches)
    return narrow.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def resample_wav(payload: bytes, target_rate: int) -> bytes:
    """Nearest-neighbor integer resample to target_rate, re-encoded as
    WAV — pure index math (out[j] = in[(j*n_in)//n_out]), deterministic
    and SQL-replayable like _ppm_resize."""
    rate, n, s = decode_wav(payload)
    n_out = (n * target_rate) // rate
    if n_out <= 0:
        return encode_wav([], rate=target_rate)
    idx = [(j * n) // n_out for j in range(n_out)]
    return encode_wav(s[idx], rate=target_rate)


def resample_audio(
    df: DataFrame,
    target_rate: int,
    id_col: str = "doc_id",
    media_col: str = "media",
    batches: int = 32,
) -> DataFrame:
    """mapInPandas audio resample: decode -> integer nearest-neighbor
    -> re-encode; one row per input, metadata refreshed from the real
    output container."""

    def run(batches_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches_iter:
            payloads = [resample_wav(bytes(p), target_rate) for p in pdf[media_col]]
            meta = [decode_wav(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media": payloads,
                    "sample_rate": pd.Series([m[0] for m in meta], dtype="int64"),
                    "n_samples": pd.Series([m[1] for m in meta], dtype="int64"),
                }
            )

    narrow = df.select(id_col, media_col).repartition(batches)
    return narrow.mapInPandas(
        run, schema="doc_id long, media binary, sample_rate long, n_samples long"
    )


# ---------------------------------------------------------------------------
# PPM-stream "video" container: concatenated binary-PPM frames (the
# motion-JPEG idea applied to the stdlib-decodable format). A REAL
# demux — parse each P6 header, compute the frame length, slice —
# rather than fixed-byte chunking, so the video path exercises genuine
# container semantics end-to-end with no external demuxer.
# ---------------------------------------------------------------------------


def video_frame_count_for(doc_id: int) -> int:
    """Fixture frame count: 3 + doc_id % 5 frames per clip."""
    return 3 + int(doc_id) % 5


def attach_ppm_video(df: DataFrame, id_col: str = "doc_id", batches: int = 32) -> DataFrame:
    """Attach a deterministic REAL video clip per row: frame f is the
    4x4 PPM whose grayscale pixel j has value
    (doc_id * 31 + f * 97 + j) % 256 — frame content shifts every frame,
    so frame-order statistics are SQL-derivable."""

    def run(batches_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches_iter:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                frames = []
                for f in range(video_frame_count_for(d)):
                    v = (d * 31 + f * 97 + np.arange(16, dtype=np.int64)) % 256
                    frames.append(encode_ppm(4, 4, np.repeat(v.astype(np.uint8), 3).tobytes()))
                payloads.append(b"".join(frames))
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "media": payloads})

    narrow = df.select(id_col).repartition(batches)
    return narrow.mapInPandas(run, schema="doc_id long, media binary")


def split_ppm_stream(payload: bytes) -> list[bytes]:
    """REAL demux of a concatenated-PPM stream: parse each frame's P6
    header for its dimensions, slice exactly one raster, repeat.
    Truncated or non-PPM trailing bytes fail loudly (decode_ppm's
    contract) — a corrupt clip must never yield silent partial frames."""
    frames: list[bytes] = []
    idx = 0
    while idx < len(payload):
        rest = payload[idx:]
        w, h, raster_off = _ppm_header(rest)
        frame_len = raster_off + 3 * w * h
        if len(rest) < frame_len:
            raise ValueError("truncated PPM frame in stream")
        frames.append(rest[:frame_len])
        idx += frame_len
    return frames or [b""]
