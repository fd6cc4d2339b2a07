"""Named refs (tags) over versioned snapshots — Iceberg-style release
pins for operators/versioned.py.

A TAG is a named immutable pointer to a committed version::

    root/_refs/<name>.json   {"version": N, "note": ...}

Tags give snapshots stable, human-meaningful addresses ("the corpus
release the 2026-07 model trained on") that survive the version
counter's churn, and they PROTECT their target from the retention
vacuum: ``expire_versions`` consults the ref store and never deletes a
tagged version, exactly like the table formats' ref-based retention —
so an audit pin keeps its bytes while the untagged history around it
is reclaimed on schedule.

Commit discipline matches the rest of the versioned seam: a tag file
is staged and published with one rename, and the rename's
fail-on-existing-FILE semantics make tag creation first-writer-wins —
two racing ``create_tag("release", ...)`` calls cannot both succeed
(this is a file-onto-file rename, which fails cleanly on both
LocalFileSystem and HDFS — unlike the dir-onto-dir case write_version
has to verify, see its race note).

Tags are metadata-only: creating, reading, and deleting one touches a
few hundred bytes regardless of snapshot size.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

from pyspark_big_data_spark.operators.versioned import (
    _fs,
    _read_json,
    list_versions,
    read_version,
)

_REFS_DIR = "_refs"
_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,99}$")


def _refs_root(root: str) -> str:
    return f"{root.rstrip('/')}/{_REFS_DIR}"


def _tag_path(root: str, name: str) -> str:
    if not _NAME_RE.match(name):
        raise ValueError(f"invalid tag name: {name!r}")
    return f"{_refs_root(root)}/{name}.json"


def create_tag(
    spark: SparkSession, root: str, name: str, version: int, note: str = ""
) -> dict:
    """Pin ``version`` under ``name``. Fails if the version is not
    committed or the tag already exists (tags are immutable — delete
    and recreate to move one, which is an auditable two-step on
    purpose)."""
    if version not in list_versions(spark, root):
        raise ValueError(f"cannot tag uncommitted version v={version} at {root}")
    target = _tag_path(root, name)
    fs, _, jvm = _fs(spark, root)
    Path = jvm.org.apache.hadoop.fs.Path
    if fs.exists(Path(target)):
        raise ValueError(f"tag {name!r} already exists at {root}")
    fs.mkdirs(Path(_refs_root(root)))
    import uuid

    nonce = uuid.uuid4().hex
    doc = {"version": int(version), "note": note, "writer": nonce}
    # writer-unique staging: with a SHARED staging name, two racing
    # creators of the same tag could interleave (A stages v1, B
    # overwrites the staging file with v2, A renames) and publish one
    # writer's doc under the other's success — uniqueness confines the
    # race to the rename
    staging = f"{_refs_root(root)}/.staging_{name}.{nonce[:12]}.json"
    out = fs.create(Path(staging), True)
    try:
        out.write(bytearray(json.dumps(doc).encode("utf-8")))
    finally:
        out.close()
    # file-onto-file rename: on HDFS/object stores this fails (returns
    # false) if the target appeared — first writer wins. On
    # RawLocalFileSystem, rename delegates to POSIX rename(2), which
    # SILENTLY OVERWRITES an existing file (r9 advice item) — so the
    # rename's return value alone can't arbitrate the race there.
    # Read-back verification closes it: each writer stamps a unique
    # nonce into its doc and only claims success if the published tag
    # still carries ITS nonce after the rename. A loser whose pin was
    # overwritten sees the winner's nonce and raises.
    if not fs.rename(Path(staging), Path(target)):
        fs.delete(Path(staging), False)
        raise ValueError(f"tag {name!r} was created concurrently at {root}")
    published = _read_json(fs, jvm, target)
    if published.get("writer") != nonce:
        raise ValueError(f"tag {name!r} was created concurrently at {root}")
    return doc


def read_tag(spark: SparkSession, root: str, name: str) -> int:
    """Resolve a tag to its pinned version; raises if absent."""
    target = _tag_path(root, name)
    fs, _, jvm = _fs(spark, root)
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(target)):
        raise FileNotFoundError(f"no tag {name!r} at {root}")
    return int(_read_json(fs, jvm, target)["version"])


def list_tags(spark: SparkSession, root: str) -> dict[str, int]:
    fs, _, jvm = _fs(spark, root)
    Path = jvm.org.apache.hadoop.fs.Path
    refs = Path(_refs_root(root))
    if not fs.exists(refs):
        return {}
    out: dict[str, int] = {}
    for status in fs.listStatus(refs):
        fname = status.getPath().getName()
        if not status.isFile() or not fname.endswith(".json") or fname.startswith("."):
            continue
        doc = _read_json(fs, jvm, str(status.getPath().toUri().getPath()))
        out[fname[: -len(".json")]] = int(doc["version"])
    return out


def delete_tag(spark: SparkSession, root: str, name: str) -> None:
    target = _tag_path(root, name)
    fs, _, jvm = _fs(spark, root)
    hp = jvm.org.apache.hadoop.fs.Path(target)
    if not fs.exists(hp):
        raise FileNotFoundError(f"no tag {name!r} at {root}")
    fs.delete(hp, False)


def read_by_tag(spark: SparkSession, root: str, name: str) -> DataFrame:
    """Time travel by name: read the snapshot a tag pins."""
    return read_version(spark, root, read_tag(spark, root, name))
