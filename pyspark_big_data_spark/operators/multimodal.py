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
    > real codec (pillow) > deterministic byte-stub. Output schema is
    identical on every path, so downstream plans never depend on which
    codec was present at runtime.
    """
    if resizer is None:
        resizer = _pil_resize if codec_available() else _stub_resize

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
    ``decoder`` resolution: explicit callable > real codec features
    (when pillow is importable) > deterministic byte-stub. All three
    produce the same FEATURES_SCHEMA, so downstream plans are identical
    with or without codecs installed.
    """
    if decoder is None:
        decoder = _image_features if codec_available() else _fake_features

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
