"""Redelivery-safe streaming sinks.

A plain ``foreachBatch`` append sink double-writes when a micro-batch
is REDELIVERED — the crash window between the sink's write and the
checkpoint commit replays the batch on restart, and Structured
Streaming's contract is exactly that the replayed batch has identical
content. ``exactly_once_parquet_sink`` turns that contract into
effective exactly-once delivery with the same primitive
operators/backfill.py uses for batch reprocessing: each micro-batch
lands in its own ``<partition_col>=<batch_id>`` hive partition via
dynamic partition overwrite, so a redelivered batch OVERWRITES its own
partition instead of appending a second copy. No transaction log, no
sink-side dedup state — idempotence comes from write scoping alone,
which is how foreachBatch exactly-once is built on real clusters when
the sink is a plain object store.

Readers ignore the batch-id partition column (it is metadata, not
data); ``spark.read.parquet(sink_dir)`` sees it as an ordinary
partition column that downstream selects simply drop.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

BATCH_COL = "_batch_id"


def exactly_once_parquet_sink(
    sink_dir: str, partition_col: str = BATCH_COL
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function writing each micro-batch to its own
    ``partition_col=batch_id`` partition with dynamic partition
    overwrite — redelivery of a batch replaces its partition with the
    identical content instead of double-appending."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn(partition_col, F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(sink_dir)
        )

    return write
