"""CDC apply-changes semantics (operators/cdc.py). Oracle parity pins
the registered whole-table witness; these tests pin the resolution
contract on hand-built logs."""

from __future__ import annotations

import pytest

from pyspark_big_data_spark.operators.cdc import apply_changes, resolve_changes


def _log(spark, rows):
    return spark.createDataFrame(rows, "k long, seq long, op string, v string")


def test_latest_sequence_wins_regardless_of_arrival(spark):
    log = _log(
        spark,
        [
            (1, 30, "u", "third"),
            (1, 10, "u", "first"),
            (1, 20, "d", None),
            (2, 5, "d", None),
            (2, 1, "u", "born"),
        ],
    )
    got = {r["k"]: (r["op"], r["v"]) for r in resolve_changes(log, "k").collect()}
    assert got == {1: ("u", "third"), 2: ("d", None)}


def test_ambiguous_winning_seq_raises(spark):
    log = _log(spark, [(1, 10, "u", "a"), (1, 10, "d", None)])
    with pytest.raises(ValueError, match="ambiguous winning"):
        resolve_changes(log, "k")


def test_non_winning_duplicate_seq_is_tolerated(spark):
    """The guard targets ties that make the FOLD nondeterministic — a
    duplicate (key, seq) strictly below the winner can't change the
    outcome, so it no longer raises (r9 advice item: the guard folds
    into the winner aggregation instead of a second full log pass)."""
    log = _log(spark, [(1, 10, "u", "a"), (1, 10, "d", None), (1, 20, "u", "z")])
    got = {r["k"]: (r["op"], r["v"]) for r in resolve_changes(log, "k").collect()}
    assert got == {1: ("u", "z")}


def test_check_unique_false_skips_guard(spark):
    log = _log(spark, [(1, 10, "u", "a"), (1, 10, "d", None), (1, 20, "u", "z")])
    got = {
        r["k"]: (r["op"], r["v"])
        for r in resolve_changes(log, "k", check_unique=False).collect()
    }
    assert got == {1: ("u", "z")}


def test_apply_folds_upserts_deletes_and_inserts(spark, tmp_path):
    path = str(tmp_path / "snap")
    spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "k long, v string"
    ).write.parquet(path)
    log = _log(
        spark,
        [
            (2, 10, "u", "two-v2"),   # update
            (3, 10, "d", None),       # delete
            (4, 10, "u", "four"),     # insert
            (9, 10, "d", None),       # delete of absent key: no-op
            (2, 20, "d", None),       # ...but 2 is then deleted at seq 20
        ],
    )
    stats = apply_changes(spark, path, log, key="k")
    assert stats == {"upserted": 1, "deleted": 3, "total": 2}
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "one", 4: "four"}


def test_apply_schema_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "snap2")
    spark.createDataFrame([(1, "one", 0)], "k long, v string, extra int").write.parquet(path)
    with pytest.raises(ValueError, match="schema mismatch"):
        apply_changes(spark, path, _log(spark, [(1, 1, "u", "x")]), key="k")
