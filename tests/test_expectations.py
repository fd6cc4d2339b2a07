"""Expectation engine (operators/expectations.py): every rule kind's
violation-counting path against planted-dirty frames, and the
single-pass compile."""

from __future__ import annotations

import pytest

from pyspark_big_data_spark.operators.expectations import expectations_report


def _report(spark, df, rules):
    return {
        r["rule"]: (r["metric"], r["passed"])
        for r in expectations_report(df, rules).collect()
    }


def test_every_rule_kind_counts_violations(spark):
    child = spark.createDataFrame(
        [
            (1, 10.0, "O"),
            (2, 10.0, "F"),
            (2, -5.0, "X"),  # dup key, out-of-range value, bad status
            (None, 2_000_000.0, "P"),  # null key, out-of-range value
            (9, None, "O"),  # value null -> bounds violation
        ],
        "k long, v double, s string",
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    rules = [
        ("not_null", "k", "k_not_null"),
        ("unique", "k", "k_unique"),
        ("bounds", "v", 0.0, 100.0, "v_bounds"),
        ("accepted", "s", ["O", "F", "P"], "s_accepted"),
        ("row_count_min", 10, "rows_min_10"),
        ("fk", "k", parent, "pk", "k_fk"),
    ]
    got = _report(spark, child, rules)
    assert got["k_not_null"] == (1.0, 0)
    assert got["k_unique"] == (1.0, 0)  # 4 non-null keys, 3 distinct
    assert got["v_bounds"] == (3.0, 0)  # -5, 2e6, null
    assert got["s_accepted"] == (1.0, 0)  # 'X'
    assert got["rows_min_10"] == (5.0, 0)  # 5 rows < 10
    assert got["k_fk"] == (1.0, 0)  # key 9 has no parent


def test_clean_frame_passes_everything(spark):
    df = spark.createDataFrame(
        [(1, 1.0, "O"), (2, 2.0, "F")], "k long, v double, s string"
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    rules = [
        ("not_null", "k", "k_not_null"),
        ("unique", "k", "k_unique"),
        ("bounds", "v", 0.0, 100.0, "v_bounds"),
        ("accepted", "s", ["O", "F"], "s_accepted"),
        ("row_count_min", 2, "rows_min_2"),
        ("fk", "k", parent, "pk", "k_fk"),
    ]
    got = _report(spark, df, rules)
    assert all(passed == 1 for _, passed in got.values())
    assert got["rows_min_2"] == (2.0, 1)


def test_scalar_rules_compile_to_one_aggregate(spark):
    """The scale contract: N scalar rules = ONE scan + one aggregate
    (no per-rule jobs). Asserted on the plan: a single pair of
    HashAggregates (partial + final) over one scan."""
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    rules = [
        ("not_null", "k", "a"),
        ("bounds", "v", 0.0, 1.0, "b"),
        ("row_count_min", 1, "c"),
    ]
    plan = (
        expectations_report(df, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ") <= 2  # the data scan + the tiny crit dim


def test_unknown_rule_kind_raises(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="unknown expectation kind"):
        expectations_report(df, [("frobnicate", "k", "x")])
