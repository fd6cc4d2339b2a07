"""Continuous training-corpus ingestion: the streaming twin of
queries/training_pipeline.py::curated_training_set.

Operational shape at 100 TB: corpus shards land as JSONL drops in an
object-store prefix; each micro-batch is quality-scored statelessly
(pure column exprs — the same functions/text.py columns the batch
pipeline uses), exact-deduped against WATERMARK-BOUNDED state on the
content fingerprint, and appended to the curated sink. State never
grows with corpus history — dropDuplicatesWithinWatermark evicts
fingerprints once the watermark passes them, which is what makes
streaming dedup feasible when the corpus is unbounded (a duplicate
arriving later than the dedup horizon is caught by the periodic batch
sweep instead; the two-tier dedup story is standard).

stream == batch is asserted in tests/test_streaming.py: the kept
fingerprint set of an availableNow replay equals the batch pipeline's
survivor fingerprints on the same quality-passing docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from pyspark_big_data_spark.functions import text as TX
from pyspark_big_data_spark.queries.training_pipeline import _LANGS, _MAX_PUNCT, _MIN_WORDS
from pyspark_big_data_spark.session import ensure_session_confs

# JSONL drop schema: the documents table plus the arrival timestamp the
# watermark runs on (producers stamp it; file-source ingestion time
# works too). _corrupt_record keeps dirty lines from failing the stream.
INGEST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("ingest_ts", T.TimestampType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def ingest_corpus_stream(
    spark: SparkSession,
    jsonl_dir: str,
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a JSONL drop dir -> quality gate -> watermarked
    exact dedup. Returns the curated stream (doc_id, lang, source,
    n_words, fp, ingest_ts); attach a sink with foreachBatch/parquet.
    ``max_files_per_trigger`` bounds the micro-batch (one file per
    batch in the replay witness, so cross-batch dedup state is
    actually exercised)."""
    ensure_session_confs(spark)
    reader = spark.readStream.schema(INGEST_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.json(jsonl_dir)
    scored = (
        raw.filter(F.col("_corrupt_record").isNull() & F.col("text").isNotNull())
        .select(
            "doc_id",
            "lang",
            "source",
            "ingest_ts",
            TX.fingerprint(F.col("text")).alias("fp"),
            TX.word_count(F.col("text")).cast("long").alias("n_words"),
            TX.punct_ratio(F.col("text")).alias("pratio"),
        )
    )
    kept = scored.filter(
        (F.col("n_words") >= _MIN_WORDS)
        & (F.col("pratio") <= _MAX_PUNCT)
        & F.col("lang").isin(*_LANGS)
    )
    return (
        kept.withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .select("doc_id", "lang", "source", "n_words", "fp", "ingest_ts")
    )
