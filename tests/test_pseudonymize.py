"""Pseudonymization semantics (operators/pseudonymize.py)."""

from __future__ import annotations

from pyspark_big_data_spark.operators.pseudonymize import pseudonym, pseudonymize


def test_deterministic_within_salt_unlinkable_across(spark):
    df = spark.createDataFrame([(1,), (2,), (1,)], "k long")
    a = [r["k"] for r in pseudonymize(df, ["k"], "salt-a").collect()]
    b = [r["k"] for r in pseudonymize(df, ["k"], "salt-a").collect()]
    c = [r["k"] for r in pseudonymize(df, ["k"], "salt-b").collect()]
    assert sorted(a) == sorted(b)          # deterministic within a salt
    assert a[0] != a[1] and len(set(a)) == 2  # distinct keys stay distinct
    assert set(a).isdisjoint(set(c))       # salt rotation breaks linkage
    assert all(len(x) == 32 for x in a)    # 32-hex md5, string-typed


def test_null_keys_stay_null_and_joins_survive(spark):
    left = spark.createDataFrame([(1, "a"), (None, "n")], "k long, tag string")
    right = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    lp = pseudonymize(left, ["k"], "s")
    rp = pseudonymize(right, ["k"], "s")
    assert [r["k"] for r in lp.filter(lp["tag"] == "n").collect()] == [None]
    joined = lp.join(rp, "k")
    assert [(r["tag"], r["v"]) for r in joined.collect()] == [("a", 10.0)]


def test_plan_is_pure_column_expression(spark):
    from pyspark_big_data_spark.testing import physical_plan

    df = spark.createDataFrame([(1,)], "k long")
    plan = physical_plan(pseudonymize(df, ["k"], "s"))
    for node in ("BatchEvalPython", "ArrowEvalPython", "Exchange"):
        assert node not in plan  # codegen md5, no shuffle, no Python
