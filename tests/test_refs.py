"""Tag refs over versioned snapshots (operators/refs.py)."""

from __future__ import annotations

import pytest

from pyspark_big_data_spark.operators.refs import (
    create_tag,
    delete_tag,
    list_tags,
    read_by_tag,
    read_tag,
)
from pyspark_big_data_spark.operators.versioned import (
    expire_versions,
    list_versions,
    read_version,
    write_version,
)


def _history(spark, tmp_path, n=3):
    root = str(tmp_path / "dim")
    for i in range(n):
        df = spark.createDataFrame([(k, i) for k in range(5)], "k long, gen int")
        assert write_version(df, root) == i
    return root


def test_tag_roundtrip_and_listing(spark, tmp_path):
    root = _history(spark, tmp_path)
    create_tag(spark, root, "rel-1.0", 1, note="first release")
    assert read_tag(spark, root, "rel-1.0") == 1
    assert list_tags(spark, root) == {"rel-1.0": 1}
    assert {r["gen"] for r in read_by_tag(spark, root, "rel-1.0").collect()} == {1}
    delete_tag(spark, root, "rel-1.0")
    assert list_tags(spark, root) == {}
    with pytest.raises(FileNotFoundError):
        read_tag(spark, root, "rel-1.0")


def test_tags_are_immutable_and_validated(spark, tmp_path):
    root = _history(spark, tmp_path)
    create_tag(spark, root, "pin", 0)
    with pytest.raises(ValueError, match="already exists"):
        create_tag(spark, root, "pin", 2)  # no silent retarget
    with pytest.raises(ValueError, match="uncommitted"):
        create_tag(spark, root, "ghost", 99)
    with pytest.raises(ValueError, match="invalid tag name"):
        create_tag(spark, root, "../escape", 0)


def test_tag_create_detects_silent_overwrite(spark, tmp_path, monkeypatch):
    """POSIX rename(2) under RawLocalFileSystem silently overwrites an
    existing destination file, so the rename's return value alone can't
    arbitrate two racing create_tag calls (r9 advice item). Each writer
    stamps a unique nonce and re-reads the published tag: a writer whose
    pin was overwritten between its rename and its read-back must raise,
    not report success over the other writer's pin."""
    from pyspark_big_data_spark.operators import refs as refs_mod

    root = _history(spark, tmp_path)
    # success path publishes THIS writer's nonce
    doc = create_tag(spark, root, "ok", 0)
    assert doc["writer"]
    delete_tag(spark, root, "ok")

    # loser path: simulate the overwrite window by making the read-back
    # observe a different writer's doc
    real_read = refs_mod._read_json
    monkeypatch.setattr(
        refs_mod,
        "_read_json",
        lambda fs, jvm, p: {**real_read(fs, jvm, p), "writer": "someone-else"},
    )
    with pytest.raises(ValueError, match="concurrently"):
        create_tag(spark, root, "raced", 0)


def test_vacuum_spares_tagged_versions(spark, tmp_path):
    root = _history(spark, tmp_path, n=4)
    create_tag(spark, root, "audit", 1)
    expired = expire_versions(spark, root, keep_last=1)
    assert expired == [0, 2]  # 1 is tagged, 3 is newest
    assert list_versions(spark, root) == [1, 3]
    assert {r["gen"] for r in read_by_tag(spark, root, "audit").collect()} == {1}
    # untag and vacuum again: now it goes
    delete_tag(spark, root, "audit")
    assert expire_versions(spark, root, keep_last=1) == [1]
    with pytest.raises(ValueError):
        read_version(spark, root, 1)
