"""Stream-stream interval join: the incremental twin of
queries/event_windows.py::click_purchase_attribution.

Two streams derived from the event source (clicks and purchases) join
on user_id with the purchase constrained to the attribution horizon
after the click. This is the canonical Structured Streaming
stream-stream join shape: BOTH sides carry watermarks and the join
condition bounds event time on both sides, so the state store can
evict a click once the watermark passes click_ts + horizon and a
purchase once it can no longer match any retained click — state is
bounded by (watermark delay + horizon) x arrival rate, never by
stream length.

At 100 TB/day the knobs are the watermark delay (how late a purchase
may arrive and still attribute) and the state-store provider
(RocksDB); the join itself stays a user_id-keyed symmetric hash join
inside the state store. Stream == batch on replay is asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.queries.event_windows import _ATTR_HORIZON_MIN
from pyspark_big_data_spark.streaming.streams import stream_events


def attribution_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming click->purchase attribution pairs (same output schema
    and semantics as the batch twin, minus its global sort)."""
    ev = stream_events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", watermark)
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("pts"),
        )
        .withWatermark("pts", watermark)
    )
    us = F.unix_micros
    joined = clicks.join(
        purchases,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("pts") >= F.col("cts"))
        & (us(F.col("pts")) <= us(F.col("cts")) + _ATTR_HORIZON_MIN * 60 * 1_000_000),
        "inner",
    )
    return joined.select(
        "click_id",
        "purchase_id",
        "user_id",
        F.floor((us(F.col("pts")) - us(F.col("cts"))) / F.lit(1_000_000))
        .cast("long")
        .alias("gap_s"),
    )


def run_attribution_stream(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
) -> None:
    """Drive the attribution join into a checkpointed parquet sink with
    an availableNow trigger. Restart-idempotent: re-running with the
    same checkpoint replays nothing (the file source's processed-files
    log lives in the checkpoint), so the sink never accumulates
    duplicate pairs — asserted in tests/test_streaming.py."""
    q = (
        attribution_stream(spark, sf_dir, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
