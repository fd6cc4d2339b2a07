"""Structured Streaming surface: the incremental twins of the batch
event-time queries (queries/event_windows.py).

The reference has no streaming at all (SURVEY.md §2.10); this is the
engine's extension surface. Batch and stream share the same logical
operations — F.window / session_window aggregations — so correctness is
tested by equating a stream replay of the events table (availableNow
trigger) with the batch result.

Scale notes: watermarks bound state (late data beyond the watermark is
dropped); state lives in the state store keyed by (window, key) — at
100 TB the knobs are watermark delay, state-store provider (RocksDB),
and shuffle partitions, not query shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from pyspark_big_data_spark.functions.aggregates import dsum
from pyspark_big_data_spark.session import ensure_session_confs

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (file source, explicit schema —
    streaming reads never infer).

    The testdata generator has shipped ``ts`` as both TIMESTAMP(NANOS)
    (surfaced as LongType under ``nanosAsLong``) and plain
    ``timestamp[us]`` (surfaced as TIMESTAMP_NTZ), so the stream schema
    is derived from the actual parquet footer via a one-time batch
    metadata read — never hardcoded. The one-off footer read is
    driver-side metadata only (no data scan) and happens once at stream
    construction, not per micro-batch.
    """
    ensure_session_confs(spark)
    disk_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(disk_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = disk_schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # int64 epoch-nanos: integer div to micros (see io.read_table)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        # wall-clock in the session timezone (pinned UTC) == the instant
        return raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming tumbling-window aggregate (watermark bounds state)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Streaming session windows (gap-based, built-in session_window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def deduped_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: first event per (user_id, event_type) key,
    with state BOUNDED by the watermark (dropDuplicatesWithinWatermark
    evicts keys once the watermark passes them — the property that makes
    streaming dedup feasible at 100 TB, where an unbounded
    dropDuplicates state store would grow with the whole key history).

    The batch twin is distinct-on-key; stream==batch on the key SET is
    asserted in tests/test_streaming.py (the surviving row per key is
    arrival-order-dependent by definition, so only the key set is the
    contract)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete") -> DataFrame:
    """Replay the whole source with an availableNow trigger into a memory
    sink; returns the result table. Test/dev harness — production sinks
    are kafka/parquet with checkpointing."""
    spark = stream_df.sparkSession
    query = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def stream_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """readStream over a JSONL directory (file source, explicit schema).

    The streaming twin of ``io.read_jsonl``: new shard files appearing in
    ``path`` become micro-batches — the standard continuous-ingestion
    shape for training corpora landing as JSONL drops. Schema is
    mandatory (streaming reads never infer); declare a
    ``_corrupt_record`` column to keep dirty lines from failing the
    stream, same as the batch reader.
    """
    ensure_session_confs(spark)
    return spark.readStream.schema(schema).json(path)


def enriched_events(events: DataFrame, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    CURRENT state of the static customer side (Spark re-reads /
    re-plans the static side per batch — so a dimension maintained by
    another loop, e.g. scd2_maintain, is picked up as it changes).
    Broadcast by size; no stream state at all, unlike stream-stream
    joins. Emits one (segment, event) row per matched event."""
    spark = events.sparkSession
    ensure_session_confs(spark)
    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    observed = events.observe(
        "ingest_metrics",
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,8)")).cast("double").alias("sum_value"),
    )
    return observed.join(dim, "user_id").select("event_id", "user_id", "c_mktsegment", "value")
