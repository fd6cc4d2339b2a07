"""Multi-column data-layout clustering (Morton / Z-order) for
min-max data skipping.

Parquet scans prune ROW GROUPS by footer min/max stats; a sort by one
column tightens that column's ranges and destroys every other's. The
Z-order fix interleaves the bits of several columns into one sort key,
so each row group covers a small hyper-rectangle and predicates on ANY
of the clustered columns skip effectively — the layout lever behind
Delta/Iceberg OPTIMIZE ZORDER, expressed here as plain column
arithmetic + sortWithinPartitions (no table format needed).

The interleave is pure integer bit math (JVM codegen, deterministic),
so tests can pin it against a Python model; the layout EFFECT is
measured from real parquet footers (tests/test_layout.py reads
row-group stats via pyarrow and asserts the clustered write tightens
per-row-group ranges on BOTH dimensions vs a single-column sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_BITS = 16  # bits per dimension in the interleaved key (2 dims -> 32-bit key)


def _rank_scaled(col: Column, lo: Column, hi: Column, bits: int = _BITS) -> Column:
    """Scale a value into [0, 2^bits) over the [lo, hi] range — the
    cheap stand-in for a rank that needs only the column's global
    min/max (two scalars a production job computes in its write
    planning pass)."""
    span = (hi - lo).cast("double")
    safe = F.when(span == 0.0, F.lit(1.0)).otherwise(span)
    frac = (col.cast("double") - lo.cast("double")) / safe
    v = F.floor(frac * ((1 << bits) - 1)).cast("long")
    return F.greatest(F.lit(0), F.least(v, F.lit((1 << bits) - 1)))


def morton_interleave(a: Column, b: Column, bits: int = _BITS) -> Column:
    """Interleave the low ``bits`` of two non-negative longs:
    result bit 2i = a bit i, bit 2i+1 = b bit i. Fixed-width shift/mask
    chain — whole-stage codegen, no UDF."""
    acc: Column = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        acc = acc + F.shiftleft(abit, 2 * i) + F.shiftleft(bbit, 2 * i + 1)
    return acc


def zorder_key(df: DataFrame, col_a: str, col_b: str, bits: int = _BITS) -> DataFrame:
    """Attach ``_zkey`` = morton(scaled a, scaled b). The min/max
    scalars ride a 1-row broadcast (the scalar-attach pattern)."""
    stats = df.agg(
        F.min(col_a).alias("_alo"),
        F.max(col_a).alias("_ahi"),
        F.min(col_b).alias("_blo"),
        F.max(col_b).alias("_bhi"),
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    key = morton_interleave(
        _rank_scaled(F.col(col_a), F.col("_alo"), F.col("_ahi"), bits),
        _rank_scaled(F.col(col_b), F.col("_blo"), F.col("_bhi"), bits),
        bits,
    )
    return with_stats.withColumn("_zkey", key).drop("_alo", "_ahi", "_blo", "_bhi")


def cluster_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = _BITS,
) -> None:
    """Write ``df`` as parquet clustered on (col_a, col_b): range-
    partition by the Z-key (so files cover disjoint key ranges), sort
    within partitions, drop the key. Reads that filter on EITHER
    column now skip most row groups via footer min/max stats."""
    keyed = zorder_key(df, col_a, col_b, bits)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
