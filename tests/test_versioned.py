"""Versioned parquet snapshots (operators/versioned.py): commit
lifecycle, time-travel reads, and the rename-is-the-commit contract."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from pyspark_big_data_spark.operators.versioned import (
    latest_version,
    list_versions,
    read_version,
    write_version,
)


def _df(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in vals], "k long, x double")


def test_version_lifecycle(spark, tmp_path):
    root = str(tmp_path / "vds")
    assert list_versions(spark, root) == []
    assert latest_version(spark, root) is None

    assert write_version(_df(spark, [(1, 1.0), (2, 2.0)]), root) == 0
    assert write_version(_df(spark, [(1, 9.0)]), root) == 1
    assert list_versions(spark, root) == [0, 1]

    # historical version is immutable and still readable after v1
    v0 = {(r["k"], r["x"]) for r in read_version(spark, root, 0).collect()}
    assert v0 == {(1, 1.0), (2, 2.0)}
    # default read = latest committed
    latest = {(r["k"], r["x"]) for r in read_version(spark, root).collect()}
    assert latest == {(1, 9.0)}


def test_staging_dirs_are_not_versions(spark, tmp_path):
    root = str(tmp_path / "vds")
    write_version(_df(spark, [(1, 1.0)]), root)
    # a crashed writer's staging dir and unrelated dirs must not count
    os.makedirs(f"{root}/.staging_v7")
    os.makedirs(f"{root}/not_a_version")
    assert list_versions(spark, root) == [0]
    # the next commit sweeps/ignores them and lands at v=1
    assert write_version(_df(spark, [(2, 2.0)]), root) == 1


def test_missing_version_raises(spark, tmp_path):
    root = str(tmp_path / "vds")
    with pytest.raises(ValueError, match="no versions"):
        read_version(spark, root)
    write_version(_df(spark, [(1, 1.0)]), root)
    with pytest.raises(ValueError, match="does not exist"):
        read_version(spark, root, 5)


def test_derived_chain_reads_pinned_snapshots(spark, tmp_path):
    """The witness shape: each version derives from the READ-BACK
    previous one, and after the chain every historical read still
    returns its own snapshot."""
    root = str(tmp_path / "vds")
    write_version(_df(spark, [(1, 1.0), (2, 2.0), (3, 3.0)]), root)
    v0 = read_version(spark, root, 0)
    write_version(v0.filter(F.col("k") != 2), root)
    v1 = read_version(spark, root, 1)
    write_version(v1.withColumn("x", F.col("x") + 10.0), root)

    assert [r["k"] for r in read_version(spark, root, 0).orderBy("k").collect()] == [1, 2, 3]
    assert [r["k"] for r in read_version(spark, root, 1).orderBy("k").collect()] == [1, 3]
    assert [
        (r["k"], r["x"]) for r in read_version(spark, root, 2).orderBy("k").collect()
    ] == [(1, 11.0), (3, 13.0)]
