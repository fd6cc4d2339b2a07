"""Optimistic multi-writer transactions (operators/transactions.py):
disjoint-domain rebase, overlap/unknown-domain conflicts, and the
splice semantics (NULL-domain rows survive, schema pinned by name)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyspark_big_data_spark.operators.transactions import (
    SnapshotConflictError,
    commit_replace_where,
    txn_info,
)
from pyspark_big_data_spark.operators.versioned import (
    latest_version,
    read_version,
    write_version,
)


def _seed(spark, root):
    base = spark.createDataFrame(
        [
            (1, "A", 10.0),
            (2, "A", 20.0),
            (3, "B", 30.0),
            (4, "B", 40.0),
            (5, "C", 50.0),
            (6, None, 60.0),
        ],
        "k long, seg string, x double",
    )
    assert write_version(base, root) == 0
    return read_version(spark, root, 0)


def _rows(df):
    return {(r["k"], r["seg"], r["x"]) for r in df.collect()}


def test_disjoint_stale_base_rebases(spark, tmp_path):
    """Two txns derived from the SAME base v0 over disjoint slices both
    commit: the second detects the intervening version, proves
    disjointness from its recorded domain, and splices onto v1."""
    root = str(tmp_path / "txn")
    v0 = _seed(spark, root)

    a_slice = v0.filter(F.col("seg") == "A").select(
        "k", "seg", (F.col("x") + 1.0).alias("x")
    )
    assert commit_replace_where(spark, root, a_slice, "seg", ["A"], 0) == 1

    b_slice = v0.filter(F.col("seg") == "B").select(
        "k", "seg", (F.col("x") * 2.0).alias("x")
    )
    assert commit_replace_where(spark, root, b_slice, "seg", ["B"], 0) == 2

    # v1 carries only txn A's change; v2 carries both (serial result)
    assert _rows(read_version(spark, root, 1)) == {
        (1, "A", 11.0), (2, "A", 21.0), (3, "B", 30.0),
        (4, "B", 40.0), (5, "C", 50.0), (6, None, 60.0),
    }
    assert _rows(read_version(spark, root, 2)) == {
        (1, "A", 11.0), (2, "A", 21.0), (3, "B", 60.0),
        (4, "B", 80.0), (5, "C", 50.0), (6, None, 60.0),
    }
    meta = txn_info(spark, root, 2)
    assert meta["base_version"] == 0 and meta["rebased_onto"] == 1
    assert meta["values"] == ["B"]


def test_overlapping_stale_base_conflicts(spark, tmp_path):
    root = str(tmp_path / "txn")
    v0 = _seed(spark, root)
    a1 = v0.filter(F.col("seg") == "A").select("k", "seg", (F.col("x") + 1.0).alias("x"))
    assert commit_replace_where(spark, root, a1, "seg", ["A"], 0) == 1
    a2 = v0.filter(F.col("seg") == "A").select("k", "seg", (F.col("x") + 2.0).alias("x"))
    with pytest.raises(SnapshotConflictError, match="overlapping"):
        commit_replace_where(spark, root, a2, "seg", ["A"], 0)
    # multi-value domains conflict on ANY shared value
    ab = v0.filter(F.col("seg").isin("A", "B")).select("k", "seg", "x")
    with pytest.raises(SnapshotConflictError, match="overlapping"):
        commit_replace_where(spark, root, ab, "seg", ["A", "B"], 0)
    assert latest_version(spark, root) == 1


def test_untracked_intervening_version_conflicts(spark, tmp_path):
    """A plain write_version has an unknown write set: every stale-base
    txn across it must conflict rather than rebase over it."""
    root = str(tmp_path / "txn")
    v0 = _seed(spark, root)
    assert write_version(v0.filter(F.col("seg") != "C"), root) == 1
    c_slice = v0.filter(F.col("seg") == "C").select("k", "seg", "x")
    with pytest.raises(SnapshotConflictError, match="without transaction metadata"):
        commit_replace_where(spark, root, c_slice, "seg", ["C"], 0)


def test_cross_column_domain_conflicts(spark, tmp_path):
    root = str(tmp_path / "txn")
    v0 = _seed(spark, root)
    a1 = v0.filter(F.col("seg") == "A").select("k", "seg", (F.col("x") + 1.0).alias("x"))
    assert commit_replace_where(spark, root, a1, "seg", ["A"], 0) == 1
    k_slice = v0.filter(F.col("k") == 5).select("k", "seg", "x")
    with pytest.raises(SnapshotConflictError, match="domain column"):
        commit_replace_where(spark, root, k_slice, "k", [5], 0)


def test_fresh_base_commits_and_nulls_survive(spark, tmp_path):
    """base == latest commits without any conflict check; rows with a
    NULL domain value sit outside every domain and are always kept."""
    root = str(tmp_path / "txn")
    v0 = _seed(spark, root)
    # delete the whole C slice (empty slice_df = domain replace-to-empty)
    empty = v0.filter(F.lit(False)).select("k", "seg", "x")
    assert commit_replace_where(spark, root, empty, "seg", ["C"], 0) == 1
    rows = _rows(read_version(spark, root, 1))
    assert (5, "C", 50.0) not in rows
    assert (6, None, 60.0) in rows
    assert len(rows) == 5


def test_slice_projected_onto_snapshot_schema(spark, tmp_path):
    """Column-order drift in slice_df cannot fork the snapshot schema:
    the splice projects by name onto the latest version's columns."""
    root = str(tmp_path / "txn")
    v0 = _seed(spark, root)
    shuffled = v0.filter(F.col("seg") == "A").select("x", "seg", "k")
    assert commit_replace_where(spark, root, shuffled, "seg", ["A"], 0) == 1
    assert read_version(spark, root, 1).columns == ["k", "seg", "x"]
    assert _rows(read_version(spark, root, 1)) == _rows(v0)


def test_empty_domain_and_bad_base_raise(spark, tmp_path):
    root = str(tmp_path / "txn")
    v0 = _seed(spark, root)
    sl = v0.filter(F.col("seg") == "A")
    with pytest.raises(ValueError, match="non-empty domain"):
        commit_replace_where(spark, root, sl, "seg", [], 0)
    with pytest.raises(ValueError, match="ahead of latest"):
        commit_replace_where(spark, root, sl, "seg", ["A"], 7)
    with pytest.raises(ValueError, match="no versions"):
        commit_replace_where(spark, str(tmp_path / "empty"), sl, "seg", ["A"], 0)
