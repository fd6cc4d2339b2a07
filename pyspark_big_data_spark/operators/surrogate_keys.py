"""Contiguous surrogate-key assignment — distributed zipWithIndex.

Dimension builds and training-data manifests need dense ids
``1..N`` in a deterministic order. The naive Spark formulation —
``row_number() OVER (ORDER BY ...)`` with no partition key — collapses
the whole table into ONE partition for the global sort: the classic
single-executor bottleneck. The scalable plan is the two-pass offset
scheme every distributed system uses (RDD ``zipWithIndex`` does the
same under the hood):

1. range-partition + locally sort by the order columns (one sampled
   Exchange — Spark's total-order machinery, partition i holding
   strictly smaller keys than partition i+1),
2. count rows per partition (a cheap aggregate), prefix-sum the counts
   into per-partition OFFSETS on the driver (bounded by the partition
   count), broadcast them,
3. one more pass assigns ``offset[pid] + local_position + 1`` inside
   each partition — no second shuffle, no global sort point.

The partitioned frame is pinned with ``localCheckpoint`` between the
two passes: range boundaries come from sampling, so an unpinned plan
could legally re-partition differently on recomputation and tear the
offsets from the rows they were counted for.

The order must be made TOTAL by the caller (include a unique
tie-break column); with ties the assignment inside a tie group would
be partition-placement-dependent, so the witness's oracle
(ROW_NUMBER() OVER (ORDER BY ...)) would flip red — which is exactly
the desired behavior for a key-assignment routine.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def assign_surrogate_keys(
    df: DataFrame,
    order_cols: list[str],
    key_col: str = "sk",
    num_partitions: int = 32,
) -> DataFrame:
    """Add ``key_col`` = 1..N following ``order_cols`` (must be a total
    order), without a single-partition global sort."""
    shaped = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint(eager=True)  # pin sampled range boundaries
    )
    counts = {
        r["pid"]: r["n"]
        for r in shaped.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # bounded: one row per partition
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    bc = df.sparkSession.sparkContext.broadcast(offsets)

    from pyspark.sql.types import LongType, StructField, StructType

    # a FRESH StructType: StructType.add mutates in place, and
    # DataFrame.schema is cached — mutating it corrupts `shaped`'s own
    # column list (mapInPandas then tries to resolve the output-only
    # key column against the input and fails)
    out_schema = StructType(
        list(shaped.schema.fields) + [StructField(key_col, LongType(), False)]
    )

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pos = bc.value.get(pid, 0)
        for pdf in batches:
            n = len(pdf)
            pdf = pdf.copy()
            pdf[key_col] = range(pos + 1, pos + n + 1)
            pos += n
            yield pdf

    return shaped.mapInPandas(number, schema=out_schema)
