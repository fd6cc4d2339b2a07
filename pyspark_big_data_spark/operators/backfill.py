"""Reprocessing primitives: partition-scoped backfill overwrites.

The 100 TB operational reality behind both: pipelines are re-run. A
bugfix reprocesses one day out of three years of a dt-partitioned
corpus; a crashed streaming job redelivers its last micro-batch. The
primitive that makes both safe is the same — an overwrite whose SCOPE
is exactly the data being recomputed:

- ``overwrite_partitions``: Spark's dynamic partition overwrite
  (``partitionOverwriteMode=dynamic``, set per-write so no session
  state leaks): the write replaces ONLY the hive partitions present in
  the incoming frame and leaves every other partition's files
  untouched. Re-running the same backfill is idempotent; writing a
  brand-new partition appends it. This is the reprocess-one-day lever:
  the job recomputes a bounded slice and cannot clobber the rest of
  the table, no matter what the transform produces.

Static overwrite (the default mode) would instead TRUNCATE the whole
table to the incoming partitions — the classic backfill footgun this
module exists to avoid; tests pin the difference.

Reference parity note: the reference engine is read-only (four crime
queries, src/query1-4.py); reprocessing safety is part of this repo's
extension surface, same family as operators/upsert.py and
operators/versioned.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Replace exactly the hive partitions present in ``df`` under
    ``path``; all other partitions' files are left byte-identical.
    Idempotent: re-running the same backfill converges to the same
    table state."""
    if not partition_cols:
        raise ValueError("overwrite_partitions requires partition columns")
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
