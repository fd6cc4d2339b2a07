"""Multimodal queries: metadata projection (oracled) and mapInPandas
feature extraction (rows-only check: the Arrow batch path has no SQL
twin by construction)."""

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


@register("multimodal_feature_extract")  # rows-only: Arrow batch path
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = MM.attach_media(read_table(spark, sf_dir, "documents"))
    feats = MM.extract_features(docs)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(F.element_at("features", 2), 6).alias("mean_byte"),
    ).orderBy("doc_id")
