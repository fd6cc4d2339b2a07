"""Versioned parquet snapshots: time travel without a table format.

A versioned dataset is a directory of immutable full snapshots::

    root/v=0/ ... parquet + _SUCCESS
    root/v=1/ ...
    root/v=2/ ...

``write_version`` stages the new snapshot in a temp dir and RENAMES it
into ``v=N`` (N = latest + 1) — the same crash-safe single-rename seam
as operators/upsert.py, so readers never observe a half-written
version: an interrupted write leaves only a stale temp dir that the
next writer sweeps. ``read_version`` pins any historical version;
``latest_version`` resolves the newest COMMITTED one (rename is the
commit — a directory only counts once it sits at ``v=N``).

This is deliberately the poor-man's corner of a lakehouse table
format: full-copy snapshots, not file-level deltas. The honest
economics at 100 TB: keep versioning for DIMENSION-sized mutable
tables (the same tables upsert_parquet targets — customer records,
document metadata, cluster maps, index manifests) where a handful of
full copies is cheap insurance, and let the append-only fact corpora
version themselves by partition layout (dt=.../batch=...). Where
file-level time travel is required, Delta/Iceberg plug in at exactly
this seam; MIGRATION.md documents that boundary.

Reference parity note: the reference engine has no mutation surface at
all (four read-only crime queries, src/query1-4.py); versioning, like
MERGE, is part of this repo's extension surface for production
pipelines.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


_V_RE = re.compile(r"^v=(\d+)$")


def list_versions(spark: SparkSession, root: str) -> list[int]:
    """Committed version numbers at ``root``, ascending. A version is
    committed iff its directory sits at ``v=N`` (the rename IS the
    commit); staging/temp dirs never match the pattern."""
    fs, hroot, jvm = _fs(spark, root)
    if not fs.exists(hroot):
        return []
    out = []
    for status in fs.listStatus(hroot):
        if not status.isDirectory():
            continue
        m = _V_RE.match(status.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(spark: SparkSession, root: str) -> int | None:
    vs = list_versions(spark, root)
    return vs[-1] if vs else None


def write_version(df: DataFrame, root: str) -> int:
    """Commit ``df`` as the next snapshot version and return its
    number. Stage-then-rename: the snapshot is fully written under
    ``root/.staging_vN`` first, then a single atomic rename publishes
    it as ``root/v=N``. Concurrent writers race on the rename — the
    loser's rename fails (destination exists) and retries at N+1, so
    versions are never overwritten."""
    spark = df.sparkSession
    fs, hroot, jvm = _fs(spark, root)
    Path = jvm.org.apache.hadoop.fs.Path
    fs.mkdirs(hroot)
    while True:
        latest = latest_version(spark, root)
        n = 0 if latest is None else latest + 1
        staging = f"{root.rstrip('/')}/.staging_v{n}"
        fs.delete(Path(staging), True)  # sweep a crashed predecessor
        df.write.mode("overwrite").parquet(staging)
        if fs.rename(Path(staging), Path(f"{root.rstrip('/')}/v={n}")):
            return n
        # lost the race: someone committed v=N first; clean and retry
        fs.delete(Path(staging), True)


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the snapshot at ``version`` (default: latest
    committed). Raises if the version does not exist — a missing
    version must fail loudly, never read as empty."""
    if version is None:
        version = latest_version(spark, root)
        if version is None:
            raise ValueError(f"versioned dataset at {root} has no versions")
    elif version not in list_versions(spark, root):
        raise ValueError(f"version {version} does not exist under {root}")
    spark.catalog.refreshByPath(f"{root.rstrip('/')}/v={version}")
    return spark.read.parquet(f"{root.rstrip('/')}/v={version}")
