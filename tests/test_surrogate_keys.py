"""Surrogate-key assignment (operators/surrogate_keys.py): density,
determinism across partitionings, and the no-Window plan promise."""

from __future__ import annotations

from pyspark_big_data_spark.operators.surrogate_keys import assign_surrogate_keys
from pyspark_big_data_spark.testing import physical_plan


def _df(spark, n=500, parts=7):
    return spark.createDataFrame(
        [((i * 37) % 1000, i) for i in range(n)], "v long, uid long"
    ).repartition(parts)


def test_keys_are_dense_and_order_follows_sort(spark):
    out = assign_surrogate_keys(
        _df(spark), ["v", "uid"], key_col="sk", num_partitions=5
    ).collect()
    assert sorted(r["sk"] for r in out) == list(range(1, 501))  # dense 1..N
    by_sk = sorted(out, key=lambda r: r["sk"])
    keys = [(r["v"], r["uid"]) for r in by_sk]
    assert keys == sorted(keys)  # sk order IS the total order


def test_same_assignment_under_different_partitionings(spark):
    a = {
        r["uid"]: r["sk"]
        for r in assign_surrogate_keys(
            _df(spark, parts=2), ["v", "uid"], num_partitions=3
        ).collect()
    }
    b = {
        r["uid"]: r["sk"]
        for r in assign_surrogate_keys(
            _df(spark, parts=11), ["v", "uid"], num_partitions=9
        ).collect()
    }
    assert a == b  # the total order, not the layout, decides the keys


def test_plan_has_no_window(spark):
    plan = physical_plan(
        assign_surrogate_keys(_df(spark), ["v", "uid"], num_partitions=4)
    )
    assert "Window" not in plan  # the single-partition global sort is the bug
