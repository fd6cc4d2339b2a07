"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Convention (schemas.py::MEDIA_META): media travels as a BinaryType
column beside a metadata struct; compute-heavy decode/transform runs as
Arrow-batched mapInPandas over bounded-size batches.

The container has no image/audio codecs, so decode is STUBBED: the
deterministic fake derives features from the raw bytes (so tests are
real end-to-end through the Spark plumbing — schema, batching,
partitioning), and `decode_image` raises NotImplementedError exactly
where a codec (pillow/ffmpeg) would plug in.

Scale notes: binary payloads make rows wide — the layer repartitions by
target batch count before mapInPandas so a single executor never holds
too many payloads, and metadata-only queries never touch the payload
column (column pruning keeps binary IO at zero).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

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


def decode_image(payload: bytes):
    """Real decode hook — requires a codec library not present here."""
    raise NotImplementedError(
        "image decode requires pillow/opencv; plug a codec into "
        "extract_features(decoder=...) when available"
    )


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
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched; repartitioned so payload batches stay bounded. Swap
    `_fake_features` for a real decoder+model without touching the
    Spark-side shape.
    """

    def run(batches_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches_iter:
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[media_col].map(len).astype("int64"),
                    "features": pdf[media_col].map(_fake_features),
                }
            )
            yield out

    narrow = df.select(id_col, media_col).repartition(batches)
    return narrow.mapInPandas(run, schema=FEATURES_SCHEMA)
