"""Bucketed-table co-located joins.

A join between two tables bucketed (and sorted) on the join key with the
same bucket count needs NO shuffle: each task reads matching bucket
files from both sides. At 100 TB this is the difference between
re-shuffling the fact table on every join and paying the partitioning
cost once at write time — the standard layout for fact tables that join
on the same key repeatedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sort-within-bucket) table."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_by)
    if sort:
        writer = writer.sortBy(bucket_by)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
