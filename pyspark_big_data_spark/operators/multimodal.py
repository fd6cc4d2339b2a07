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
