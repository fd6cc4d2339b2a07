"""Merge-on-read keyed deletes for versioned snapshots: the
deletion-vector seam, without a table format.

A delete against a versioned snapshot (operators/versioned.py) does
NOT rewrite any data file. It commits a TOMBSTONE sidecar — a small
parquet of deleted keys — under::

    root/_deletes/v=N/d=K/ ... parquet + _SUCCESS

targeting exactly snapshot ``v=N``; data files stay byte-identical.
``read_version_mor`` ("merge on read") then serves the logical state
as ``read_version(N)`` anti-joined against the union of N's committed
tombstones, and ``materialize_deletes`` is the compaction that folds
the tombstones into a NEW physical version, returning reads to the
zero-join fast path. This is the copy-on-write vs merge-on-read trade
every lakehouse format exposes (Delta deletion vectors, Iceberg v2
position/equality deletes — here equality deletes, the
public-knowledge shape): deletes become cheap O(deleted keys) writes,
and reads pay a small anti-join until the next materialize.

Commit protocol: each delete commit stages under
``root/_deletes/v=N/.staging_dK`` and publishes by the same verified
single-rename as ``write_version`` (rename is the commit; a race loser
deletes its bytes and retries at K+1), so concurrent deleters can
never drop each other's tombstones and readers never observe a
half-written one. Tombstones are pinned to their target VERSION —
immutable snapshots stay immutable (``read_version`` never sees them:
the ``_deletes`` tree lives outside every ``v=N`` dir), history reads
above or below N are unaffected, and a later ``materialize_deletes``
or ``write_version`` starts a clean version with no tombstones.

100 TB economics: the tombstone side is deleted-keys-sized, so the
MOR anti-join broadcasts it (plan: BroadcastHashJoin LeftAnti — zero
shuffle of the data side, the only acceptable cost model when the
snapshot is 100 TB and the delete is a few million keys). When
tombstones outgrow broadcast, that is precisely the signal to
materialize; the threshold is the caller's broadcast budget, not a
hidden constant here.

Reference parity note: the reference engine
(/root/reference/src/query1-4.py) is read-only; deletes are extension
surface for production pipelines (GDPR erasure against a pinned
snapshot without a full rewrite is the motivating case — the eager
full-rewrite variant is operators/upsert.py::erase_keys_parquet).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.operators.versioned import (
    _fs,
    _resolve_version,
    commit_staged,
    list_versions,
    manifest,
    read_version,
    read_version_pruned,
    write_version,
)

DELETES_DIR = "_deletes"

_D_RE = re.compile(r"^d=(\d+)$")


def _deletes_root(root: str, version: int) -> str:
    return f"{root.rstrip('/')}/{DELETES_DIR}/v={version}"


def list_delete_commits(
    spark: SparkSession, root: str, version: int
) -> list[int]:
    """Committed delete-commit ids against ``v=version``, ascending.
    Like versions, a commit counts iff its dir sits at ``d=K`` (the
    rename is the commit); staging dirs never match."""
    droot = _deletes_root(root, version)
    fs, hroot, jvm = _fs(spark, droot)
    if not fs.exists(hroot):
        return []
    out = []
    for status in fs.listStatus(hroot):
        if not status.isDirectory():
            continue
        m = _D_RE.match(status.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def delete_keys(
    spark: SparkSession,
    root: str,
    keys: DataFrame,
    key: str,
    version: int | None = None,
) -> int:
    """Commit a deletion vector against snapshot ``v=version`` (default
    latest) and return the delete-commit id. No data file is touched —
    the delete is a tombstone parquet of DISTINCT, NON-NULL ``key``
    values (nulls are dropped: an equality delete on NULL matches no
    row in SQL semantics, so carrying them would be dead weight that
    silently never deletes).

    The key column must exist in the snapshot schema, and every delete
    commit against one version must use the SAME key column — mixed-key
    tombstones would force N anti-joins and make materialize order-
    sensitive, so the second writer with a different key raises."""
    version = _resolve_version(spark, root, version)
    if version not in list_versions(spark, root):
        raise ValueError(f"version {version} does not exist under {root}")
    snap_cols = read_version(spark, root, version).columns
    if key not in snap_cols:
        raise ValueError(
            f"delete key {key!r} is not a column of v={version} "
            f"(schema: {sorted(snap_cols)})"
        )
    existing_key = _delete_key_col(spark, root, version)
    if existing_key is not None and existing_key != key:
        raise ValueError(
            f"v={version} already has tombstones keyed by {existing_key!r}; "
            f"a second key column ({key!r}) would make merge-on-read "
            "ambiguous — materialize first"
        )
    tomb = keys.select(F.col(key)).filter(F.col(key).isNotNull()).distinct()

    droot = _deletes_root(root, version)
    fs, hroot, jvm = _fs(spark, droot)
    Path = jvm.org.apache.hadoop.fs.Path
    fs.mkdirs(hroot)
    while True:
        commits = list_delete_commits(spark, root, version)
        k = (commits[-1] + 1) if commits else 0
        staging = f"{droot}/.staging_d{k}"
        fs.delete(Path(staging), True)  # sweep a crashed predecessor
        tomb.write.mode("overwrite").parquet(staging)
        if commit_staged(fs, jvm, droot, staging, k, prefix="d="):
            return k
        # lost the race: another deleter took d=K; retry at K+1


def _delete_key_col(
    spark: SparkSession, root: str, version: int
) -> str | None:
    """The single key column of the committed tombstones for
    ``v=version`` (None when there are none). Enforces the one-key
    contract on read, so a foreign file dropped into the deletes tree
    fails loudly instead of silently skewing the anti-join."""
    commits = list_delete_commits(spark, root, version)
    if not commits:
        return None
    cols = set()
    droot = _deletes_root(root, version)
    for k in commits:
        spark.catalog.refreshByPath(f"{droot}/d={k}")
        cols.update(spark.read.parquet(f"{droot}/d={k}").columns)
    if len(cols) != 1:
        raise ValueError(
            f"tombstones of v={version} carry mixed key columns "
            f"{sorted(cols)}; merge-on-read needs exactly one"
        )
    return next(iter(cols))


def deleted_keys(
    spark: SparkSession, root: str, version: int | None = None
) -> tuple[DataFrame | None, str | None]:
    """``(keys_df, key_col)`` — the union of all committed tombstones
    against ``v=version``, distinct; ``(None, None)`` when the version
    has no deletes."""
    version = _resolve_version(spark, root, version)
    key = _delete_key_col(spark, root, version)
    if key is None:
        return None, None
    droot = _deletes_root(root, version)
    paths = [f"{droot}/d={k}" for k in list_delete_commits(spark, root, version)]
    for p in paths:
        spark.catalog.refreshByPath(p)
    return spark.read.parquet(*paths).distinct(), key


def read_version_mor(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    pruned_col: str | None = None,
    lower=None,
    upper=None,
) -> DataFrame:
    """Merge-on-read: the LOGICAL state of ``v=version`` = the pinned
    physical snapshot anti-joined against its committed tombstones. A
    version with no deletes returns the plain ``read_version`` plan
    (zero extra nodes). The tombstone side is explicitly broadcast —
    deleted keys are small by the module contract, so the plan is a
    BroadcastHashJoin LeftAnti with NO shuffle of the data side.

    With ``pruned_col``, the data side goes through
    ``read_version_pruned`` first — footer-stats file pruning COMPOSES
    with merge-on-read (prune, then anti-join the survivors), which is
    the plan a 100 TB range query over a deleted-from snapshot needs:
    file skip first, tombstone mask second, both before any wide op."""
    version = _resolve_version(spark, root, version)
    if pruned_col is not None:
        base = read_version_pruned(spark, root, pruned_col, lower, upper, version)
    else:
        base = read_version(spark, root, version)
    tomb, key = deleted_keys(spark, root, version)
    if tomb is None:
        return base
    return base.join(F.broadcast(tomb), key, "left_anti")


def materialize_deletes(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    target_files: int | None = None,
) -> int:
    """Fold the tombstones of ``v=version`` into a NEW physical
    version (copy-on-write moment of the MOR lifecycle) and return its
    number. The new snapshot carries the source manifest's stats/bloom
    columns (re-derived over the new files), has NO tombstones, and
    reads of it take the zero-join fast path again. The SOURCE version
    and its tombstones are untouched — time travel to the pre-delete
    physical state or replay of the MOR view both keep working until
    retention expires them. With ``target_files``, the rewrite also
    bin-packs (a delete wave often strands small files; folding the
    compaction into the same rewrite saves a second full pass)."""
    version = _resolve_version(spark, root, version)
    tomb, _ = deleted_keys(spark, root, version)
    has_pos = bool(list_pos_delete_commits(spark, root, version))
    if tomb is None and not has_pos:
        raise ValueError(
            f"v={version} under {root} has no tombstones to materialize"
        )
    m = manifest(spark, root, version)
    stats_cols = list(m["stats_cols"]) if m else None
    bloom_cols = list(m["bloom_cols"]) if m and m.get("bloom_cols") else None
    # read_version_mor_pos applies BOTH vector types (positional and
    # equality), so the fold clears everything in one rewrite
    df = (
        read_version_mor_pos(spark, root, version)
        if has_pos
        else read_version_mor(spark, root, version)
    )
    if target_files is not None:
        df = df.coalesce(target_files)
    return write_version(df, root, stats_cols=stats_cols, bloom_cols=bloom_cols)


# ---------------------------------------------------------------------------
# POSITIONAL deletes (r10): the other deletion-vector type. An equality
# delete says "any row whose KEY is k is gone"; a positional delete
# says "row #i of file f is gone" — the form engines emit from a MERGE
# scan, and the only form that can delete ONE of two bit-identical
# rows. Tombstones are (_file, _pos) parquet under
# root/_pos_deletes/v=N/d=K (same verified-rename commit); the MOR
# read anti-joins on Spark's parquet _metadata columns (file_name,
# row_index), which cost nothing to materialize — they come off the
# reader state, no data pass.
# ---------------------------------------------------------------------------

POS_DELETES_DIR = "_pos_deletes"

FILE_COL = "_file"
POS_COL = "_pos"


def _pos_deletes_root(root: str, version: int) -> str:
    return f"{root.rstrip('/')}/{POS_DELETES_DIR}/v={version}"


def list_pos_delete_commits(
    spark: SparkSession, root: str, version: int
) -> list[int]:
    droot = _pos_deletes_root(root, version)
    fs, hroot, jvm = _fs(spark, droot)
    if not fs.exists(hroot):
        return []
    out = []
    for status in fs.listStatus(hroot):
        if not status.isDirectory():
            continue
        m = _D_RE.match(status.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def with_positions(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """The pinned snapshot with its physical addresses attached:
    ``_file`` (file name) and ``_pos`` (row index within the file) from
    the parquet reader's ``_metadata`` struct. This is the scan a
    MERGE/DELETE planner runs to DECIDE positional tombstones — the
    address columns are reader state, not data, so the scan costs the
    same as the plain read. Raises if the data schema already uses the
    reserved address names — a silent duplicate column would corrupt
    the anti-join."""
    base = read_version(spark, root, version)
    _guard_reserved_address_cols(base)
    return base.select(
        F.col("_metadata.file_name").alias(FILE_COL),
        F.col("_metadata.row_index").alias(POS_COL),
        "*",
    )


def _guard_reserved_address_cols(df: DataFrame) -> None:
    clash = {FILE_COL, POS_COL} & set(df.columns)
    if clash:
        raise ValueError(
            f"snapshot schema uses reserved positional-delete address "
            f"column(s) {sorted(clash)}; rename them before using "
            "positional deletes"
        )


def delete_positions(
    spark: SparkSession,
    root: str,
    positions: DataFrame,
    version: int | None = None,
) -> int:
    """Commit a POSITIONAL deletion vector against ``v=version``: a
    parquet of distinct ``(_file, _pos)`` addresses (build them with
    ``with_positions``), published by the verified rename. No data
    file is touched; nulls in either address column are refused (a
    null address is a planner bug, not a deletable row)."""
    version = _resolve_version(spark, root, version)
    if version not in list_versions(spark, root):
        raise ValueError(f"version {version} does not exist under {root}")
    missing = {FILE_COL, POS_COL} - set(positions.columns)
    if missing:
        raise ValueError(
            f"positional delete needs columns {sorted((FILE_COL, POS_COL))}; "
            f"missing {sorted(missing)} (build with with_positions)"
        )
    tomb = positions.select(FILE_COL, POS_COL).distinct()
    if tomb.filter(
        F.col(FILE_COL).isNull() | F.col(POS_COL).isNull()
    ).limit(1).count():
        raise ValueError("positional delete contains null addresses")

    droot = _pos_deletes_root(root, version)
    fs, hroot, jvm = _fs(spark, droot)
    Path = jvm.org.apache.hadoop.fs.Path
    fs.mkdirs(hroot)
    while True:
        commits = list_pos_delete_commits(spark, root, version)
        k = (commits[-1] + 1) if commits else 0
        staging = f"{droot}/.staging_d{k}"
        fs.delete(Path(staging), True)
        tomb.write.mode("overwrite").parquet(staging)
        if commit_staged(fs, jvm, droot, staging, k, prefix="d="):
            return k


def read_version_mor_pos(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Merge-on-read through POSITIONAL tombstones: the pinned snapshot
    minus exactly the tombstoned (file, row) addresses — an anti-join
    of the ``_metadata`` address against the broadcast tombstone union.
    Composes with equality deletes: the returned frame is further
    masked by ``deleted_keys`` when the version carries those too (both
    vector types apply, the Iceberg v2 read contract)."""
    version = _resolve_version(spark, root, version)
    base = read_version(spark, root, version)
    _guard_reserved_address_cols(base)
    base = base.select(
        F.col("_metadata.file_name").alias(FILE_COL),
        F.col("_metadata.row_index").alias(POS_COL),
        "*",
    )
    commits = list_pos_delete_commits(spark, root, version)
    if commits:
        droot = _pos_deletes_root(root, version)
        paths = [f"{droot}/d={k}" for k in commits]
        for p in paths:
            spark.catalog.refreshByPath(p)
        tomb = spark.read.parquet(*paths).distinct()
        base = base.join(F.broadcast(tomb), [FILE_COL, POS_COL], "left_anti")
    out = base.drop(FILE_COL, POS_COL)
    ekeys, kcol = deleted_keys(spark, root, version)
    if ekeys is not None:
        out = out.join(F.broadcast(ekeys), kcol, "left_anti")
    return out
