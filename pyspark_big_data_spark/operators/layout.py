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


def morton_interleave_n(cols: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` of N non-negative longs: output bit
    j*N + i = bit j of column i — the N-dimensional Morton code. Same
    fixed-width shift/mask chain as the 2-D version (whole-stage
    codegen, no UDF); keep N*bits <= 62 so the key fits a long."""
    n = len(cols)
    if n < 2:
        raise ValueError("morton interleave needs >= 2 columns")
    if n * bits > 62:
        raise ValueError(f"{n} dims x {bits} bits overflows a long key")
    acc: Column = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            acc = acc + F.shiftleft(bit, j * n + i)
    return acc


def zorder_key_n(
    df: DataFrame, cols: list[str], bits: int | None = None
) -> DataFrame:
    """Attach ``_zkey`` = N-dim morton over rank-scaled columns. Bits
    per dimension default to 48 // N (16 at N=3 — the same per-dim
    resolution as the 2-D path at N<=3, degrading gracefully for more
    dimensions, which is also the honest Z-order caveat: each added
    dimension SPENDS resolution, so past ~4 columns the clustering
    stops paying and a hierarchical layout wins)."""
    if bits is None:
        bits = max(4, 48 // len(cols))
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"_{c}_lo"))
        aggs.append(F.max(c).alias(f"_{c}_hi"))
    stats = df.agg(*aggs)
    with_stats = df.crossJoin(F.broadcast(stats))
    scaled = [
        _rank_scaled(F.col(c), F.col(f"_{c}_lo"), F.col(f"_{c}_hi"), bits)
        for c in cols
    ]
    key = morton_interleave_n(scaled, bits)
    drop = [f"_{c}_lo" for c in cols] + [f"_{c}_hi" for c in cols]
    return with_stats.withColumn("_zkey", key).drop(*drop)


def cluster_write_n(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int | None = None,
) -> None:
    """N-dimensional ``cluster_write``: range-partition + sort by the
    N-dim Z-key, so every file covers a small hyper-rectangle of ALL
    clustered columns and predicates on ANY of them skip files/row
    groups via footer stats."""
    keyed = zorder_key_n(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
