"""Multi-table atomic commits (operators/multitxn.py): cross-table
publish atomicity, the crash window, optimistic table-granular
concurrency, and transaction time travel."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from pyspark_big_data_spark.operators.multitxn import (
    TxnConflict,
    commit_txn,
    latest_txn,
    list_txns,
    read_txn_table,
    txn_manifest,
)
from pyspark_big_data_spark.operators.versioned import write_version


def _orders(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("o_id"), (F.col("id") * 10.0).alias("o_total")
    )


def _items(spark, lo, hi, per=2):
    return (
        spark.range(lo, hi)
        .select(F.explode(F.sequence(F.lit(1), F.lit(per))).alias("ln"), "id")
        .select(F.col("id").alias("o_id"), "ln", (F.col("id") + 0.5).alias("qty"))
    )


def test_commit_and_read_are_cross_table_consistent(spark, tmp_path):
    g = str(tmp_path / "grp")
    t0 = commit_txn(
        spark, g, {"orders": _orders(spark, 0, 10), "items": _items(spark, 0, 10)}
    )
    assert t0 == 0
    assert latest_txn(spark, g) == 0
    m = txn_manifest(spark, g)
    assert m["tables"] == {"items": 0, "orders": 0}
    assert read_txn_table(spark, g, "orders").count() == 10
    assert read_txn_table(spark, g, "items").count() == 20

    # append txn: both tables advance under ONE manifest
    t1 = commit_txn(
        spark,
        g,
        {"orders": _orders(spark, 10, 15), "items": _items(spark, 10, 15)},
        append=True,
    )
    assert t1 == 1
    assert txn_manifest(spark, g)["tables"] == {"items": 1, "orders": 1}
    assert read_txn_table(spark, g, "orders").count() == 15
    # time travel: the t=0 pair still reads consistently
    assert read_txn_table(spark, g, "orders", txn=0).count() == 10
    assert read_txn_table(spark, g, "items", txn=0).count() == 20


def test_crash_window_publishes_nothing(spark, tmp_path):
    """Phase 1 (per-table data versions) without phase 2 (the manifest
    rename) must be invisible: a reader resolving through the
    transaction log never observes table A's new version without B's."""
    g = str(tmp_path / "grp")
    commit_txn(
        spark, g, {"orders": _orders(spark, 0, 10), "items": _items(spark, 0, 10)}
    )
    # simulate the crash: new versions land on BOTH tables, but the
    # process dies before the t=1 manifest rename
    write_version(_orders(spark, 0, 99), f"{g}/orders")
    write_version(_items(spark, 0, 99), f"{g}/items")
    # ...and a torn staging dir in the txn log must not count either
    os.makedirs(f"{g}/_txn/.staging_t1.deadbeef", exist_ok=True)

    assert latest_txn(spark, g) == 0
    assert list_txns(spark, g) == [0]
    assert read_txn_table(spark, g, "orders").count() == 10
    assert read_txn_table(spark, g, "items").count() == 20

    # the next committed transaction seals over the debris
    t = commit_txn(spark, g, {"orders": _orders(spark, 0, 30)})
    assert t == 1
    assert read_txn_table(spark, g, "orders").count() == 30
    assert read_txn_table(spark, g, "items").count() == 20  # carried pin


def test_expected_txn_pin_refuses_stale_plan(spark, tmp_path):
    g = str(tmp_path / "grp")
    commit_txn(spark, g, {"orders": _orders(spark, 0, 10)})
    commit_txn(spark, g, {"orders": _orders(spark, 0, 20)})
    with pytest.raises(TxnConflict, match="moved"):
        commit_txn(spark, g, {"orders": _orders(spark, 0, 5)}, expected_txn=0)


def test_concurrent_disjoint_tables_rebase(spark, tmp_path, monkeypatch):
    """A writer that loses the publish to a winner touching DISJOINT
    tables rebases: its map merges over the winner's and lands at the
    next id — both writers' tables advance, neither's pins lost."""
    import pyspark_big_data_spark.operators.multitxn as MT

    g = str(tmp_path / "grp")
    commit_txn(
        spark, g, {"orders": _orders(spark, 0, 10), "items": _items(spark, 0, 10)}
    )
    commit_txn(spark, g, {"items": _items(spark, 0, 30)})  # the "winner" (t=1)

    # make the loser PLAN against t=0 (stale), then see reality
    real = MT.latest_txn
    state = {"first": True}

    def stale_once(spark_, root_):
        if state["first"]:
            state["first"] = False
            return 0
        return real(spark_, root_)

    monkeypatch.setattr(MT, "latest_txn", stale_once)
    t = commit_txn(spark, g, {"orders": _orders(spark, 0, 40)})
    assert t == 2
    m = txn_manifest(spark, g)["tables"]
    assert read_txn_table(spark, g, "orders").count() == 40  # loser's write
    assert read_txn_table(spark, g, "items").count() == 60  # winner's kept


def test_concurrent_same_table_conflicts(spark, tmp_path, monkeypatch):
    import pyspark_big_data_spark.operators.multitxn as MT

    g = str(tmp_path / "grp")
    commit_txn(spark, g, {"orders": _orders(spark, 0, 10)})
    commit_txn(spark, g, {"orders": _orders(spark, 0, 20)})  # winner (t=1)

    real = MT.latest_txn
    state = {"first": True}

    def stale_once(spark_, root_):
        if state["first"]:
            state["first"] = False
            return 0
        return real(spark_, root_)

    monkeypatch.setattr(MT, "latest_txn", stale_once)
    with pytest.raises(TxnConflict, match="orders"):
        commit_txn(spark, g, {"orders": _orders(spark, 0, 5)})
    # nothing published: the group still reads the winner's state
    assert latest_txn(spark, g) == 1
    assert read_txn_table(spark, g, "orders").count() == 20


def test_pinned_commit_never_rebases(spark, tmp_path, monkeypatch):
    """expected_txn is re-checked at publish: even a DISJOINT-table
    winner refuses a pinned commit (its writes may be derived from the
    other tables' state at the pin — rebasing would silently violate
    the snapshot the caller reasoned from)."""
    import pyspark_big_data_spark.operators.multitxn as MT

    g = str(tmp_path / "grp")
    commit_txn(
        spark, g, {"orders": _orders(spark, 0, 10), "items": _items(spark, 0, 10)}
    )
    commit_txn(spark, g, {"items": _items(spark, 0, 30)})  # disjoint winner

    real = MT.latest_txn
    state = {"first": True}

    def stale_once(spark_, root_):
        if state["first"]:
            state["first"] = False
            return 0
        return real(spark_, root_)

    monkeypatch.setattr(MT, "latest_txn", stale_once)
    with pytest.raises(TxnConflict, match="pinned"):
        commit_txn(spark, g, {"orders": _orders(spark, 0, 40)}, expected_txn=0)
    assert latest_txn(spark, g) == 1  # nothing published


def test_append_to_unknown_table_refused(spark, tmp_path):
    g = str(tmp_path / "grp")
    commit_txn(spark, g, {"orders": _orders(spark, 0, 10)})
    with pytest.raises(ValueError, match="not yet in the group"):
        commit_txn(spark, g, {"items": _items(spark, 0, 5)}, append=True)


def test_multi_table_sink_atomic_and_idempotent(spark, tmp_path):
    """Each micro-batch fans out to two tables under ONE transaction;
    a redelivered batch (even with corrupted content) is skipped."""
    from pyspark_big_data_spark.streaming.sinks import (
        exactly_once_multi_table_sink,
    )

    g = str(tmp_path / "grp")

    def splitter(batch):
        agg = batch.groupBy().agg(F.count(F.lit(1)).alias("n"))
        return {"facts": batch, "counts": agg}

    sink = exactly_once_multi_table_sink(g, splitter)
    sink(_orders(spark, 0, 10), 0)
    sink(_orders(spark, 10, 15), 1)
    assert list_txns(spark, g) == [0, 1]
    for t in (0, 1):
        assert set(txn_manifest(spark, g, t)["tables"]) == {"facts", "counts"}
    assert read_txn_table(spark, g, "facts").count() == 15
    assert sorted(
        r["n"] for r in read_txn_table(spark, g, "counts").collect()
    ) == [5, 10]

    # corrupted redelivery: no new txn, nothing changes
    sink(_orders(spark, 0, 99), 1)
    assert list_txns(spark, g) == [0, 1]
    assert read_txn_table(spark, g, "facts").count() == 15

    # empty splitter output is refused, not silently skipped
    with pytest.raises(ValueError, match="no tables"):
        exactly_once_multi_table_sink(g, lambda b: {})(_orders(spark, 0, 1), 9)


def test_multi_table_sink_through_real_stream(spark, tmp_path):
    """The sink behind an actual availableNow foreachBatch loop."""
    import json as _json
    import os

    from pyspark_big_data_spark.streaming.sinks import (
        exactly_once_multi_table_sink,
    )

    g = str(tmp_path / "grp")
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    for i in range(3):
        with open(f"{drop}/b{i}.jsonl", "w") as fh:
            fh.write(
                "\n".join(
                    _json.dumps({"o_id": i * 10 + j, "o_total": float(j)})
                    for j in range(4)
                )
            )

    def splitter(batch):
        return {
            "facts": batch,
            "sums": batch.groupBy().agg(F.sum("o_total").alias("s")),
        }

    sink = exactly_once_multi_table_sink(g, splitter)
    q = (
        spark.readStream.schema("o_id long, o_total double")
        .option("maxFilesPerTrigger", 1)
        .json(drop)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert read_txn_table(spark, g, "facts").count() == 12
    assert read_txn_table(spark, g, "sums").count() == 3
    assert len(list_txns(spark, g)) == 3


def test_expire_group_protects_surviving_pins(spark, tmp_path):
    """Group retention: old txn manifests expire, surviving manifests'
    pins (and their chains) survive per-table expiry, unreferenced
    crash debris is reclaimed, and the surviving txns still read."""
    from pyspark_big_data_spark.operators.multitxn import expire_group
    from pyspark_big_data_spark.operators.versioned import list_versions

    g = str(tmp_path / "grp")
    commit_txn(
        spark, g, {"orders": _orders(spark, 0, 10), "items": _items(spark, 0, 10)}
    )
    commit_txn(spark, g, {"orders": _orders(spark, 10, 15)}, append=True)
    commit_txn(spark, g, {"items": _items(spark, 10, 12)}, append=True)
    # crash debris: an unreferenced orders version
    write_version(_orders(spark, 0, 99), f"{g}/orders")
    assert list_versions(spark, f"{g}/orders") == [0, 1, 2]

    res = expire_group(spark, g, keep_last_txns=2)
    assert res["txns"] == [0]
    assert list_txns(spark, g) == [1, 2]
    # the DEFAULT pass leaves the above-pin debris alone: it is
    # indistinguishable from a live writer's phase-1 commit
    assert list_versions(spark, f"{g}/orders") == [0, 1, 2]
    assert read_txn_table(spark, g, "orders", txn=1).count() == 15
    assert read_txn_table(spark, g, "items", txn=2).count() == 24
    # expired txn time travel fails loudly
    with pytest.raises(ValueError, match="does not exist"):
        read_txn_table(spark, g, "orders", txn=0)

    # quiesced vacuum (caller asserts no in-flight writer): the debris
    # above every pin goes too, pinned history survives
    res2 = expire_group(spark, g, keep_last_txns=2, reclaim_unreferenced=True)
    assert 2 in res2["versions"]["orders"]
    assert list_versions(spark, f"{g}/orders") == [0, 1]
    assert read_txn_table(spark, g, "orders", txn=1).count() == 15


def test_expire_group_age_based_reclaim(spark, tmp_path):
    """reclaim_older_than (r13): a STALE above-pin orphan is reclaimed
    without the quiesce assertion; a fresh one (a live writer's
    possible phase-1 commit) is spared."""
    from pyspark_big_data_spark.operators.multitxn import expire_group
    from pyspark_big_data_spark.operators.versioned import list_versions

    g = str(tmp_path / "grp")
    commit_txn(
        spark, g, {"orders": _orders(spark, 0, 10), "items": _items(spark, 0, 10)}
    )
    commit_txn(spark, g, {"orders": _orders(spark, 10, 15)}, append=True)
    # two orphans above the pin: one stale, one fresh
    write_version(_orders(spark, 0, 99), f"{g}/orders")   # v=2 stale
    write_version(_orders(spark, 0, 98), f"{g}/orders")   # v=3 fresh
    import os
    import time

    old = time.time() - 7200
    os.utime(f"{g}/orders/v=2", (old, old))

    res = expire_group(spark, g, keep_last_txns=2, reclaim_older_than=3600)
    assert 2 in res["versions"]["orders"]
    assert list_versions(spark, f"{g}/orders") == [0, 1, 3]
    # surviving pins still read
    assert read_txn_table(spark, g, "orders", txn=1).count() == 15
    # second vacuum after the fresh orphan ages out drains it too
    os.utime(f"{g}/orders/v=3", (old, old))
    res2 = expire_group(spark, g, keep_last_txns=2, reclaim_older_than=3600)
    assert 3 in res2["versions"]["orders"]
    assert list_versions(spark, f"{g}/orders") == [0, 1]


@pytest.mark.parametrize("seed", [3, 17])
def test_multi_writer_model_randomized(spark, tmp_path, seed):
    """Model-based randomized multi-writer exercise of the commit_txn
    rebase/refuse ladder (r12 verdict What's-missing #5, the pattern of
    the merge-DAG model tests): N writers with seeded random table
    subsets run CONCURRENTLY (threads), each retrying on TxnConflict
    with re-derived writes. Schedule-independent invariants asserted
    against the manifest history afterwards:

    - no lost transactions: txn ids are contiguous, one per success;
    - ATOMICITY (no half-applied transaction): the pins that changed
      at each manifest are exactly ONE writer's declared table set,
      and every changed pin's table content carries that writer's
      marker;
    - no lost pins: untouched tables carry their pins forward
      unchanged at every step;
    - every pinned version is readable at its transaction (the
      cross-table consistency read).

    Plus a deterministic stale-pin coda: expected_txn refuses after an
    interloper and leaves the manifest history untouched."""
    import random
    from concurrent.futures import ThreadPoolExecutor

    from pyspark_big_data_spark.operators.multitxn import TxnConflict

    rng = random.Random(seed)
    g = str(tmp_path / "grp")
    tables = ["ta", "tb", "tc", "td"]

    def _payload(writer_id):
        return spark.createDataFrame(
            [(i, writer_id) for i in range(5)], "k int, writer string"
        )

    commit_txn(spark, g, {t: _payload("init") for t in tables})

    plans = [
        (f"w{i}", sorted(rng.sample(tables, rng.randint(1, 3))))
        for i in range(8)
    ]

    def _run(plan):
        wid, tbls = plan
        for _ in range(20):
            try:
                k = commit_txn(
                    spark, g, {t: _payload(wid) for t in tbls}
                )
                return wid, tbls, k
            except TxnConflict:
                continue
        raise AssertionError(f"writer {wid} starved")

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(_run, plans))

    txn_ids = sorted(k for _, _, k in results)
    assert txn_ids == list(range(1, 9))  # contiguous, one per success
    by_txn = {k: (wid, tbls) for wid, tbls, k in results}

    prev = txn_manifest(spark, g, 0)["tables"]
    for k in range(1, 9):
        cur = txn_manifest(spark, g, k)["tables"]
        wid, tbls = by_txn[k]
        changed = sorted(t for t in cur if cur[t] != prev.get(t))
        assert changed == tbls, (k, wid, changed, tbls)
        for t in tbls:  # changed pin content carries THIS writer's marker
            got = read_txn_table(spark, g, t, txn=k)
            writers = [r["writer"] for r in got.select("writer").distinct().collect()]
            assert writers == [wid], (k, t, writers)
        for t in set(prev) - set(tbls):  # untouched pins carried forward
            assert cur[t] == prev[t], (k, t)
        prev = cur

    # stale-pin coda: a pinned commit refuses after ANY movement and
    # publishes nothing
    before = list_txns(spark, g)
    pin = before[-1] - 1
    with pytest.raises(TxnConflict):
        commit_txn(
            spark, g, {"ta": _payload("stale")}, expected_txn=pin
        )
    assert list_txns(spark, g) == before
    final = txn_manifest(spark, g)["tables"]
    assert final == prev  # nothing half-applied by the refused commit
