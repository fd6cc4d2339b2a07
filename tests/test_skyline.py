"""Two-phase skyline semantics (operators/skyline.py).

Oracle parity pins the registered part/lineitem frontiers against the
NOT EXISTS definition in DuckDB; these tests pin the kernel's edge
semantics and the local-phase reduction on adversarial partitionings.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_big_data_spark.operators.skyline import skyline


def _brute(rows, signs):
    x = np.array([r[1:] for r in rows], dtype=float) * signs
    keep = []
    for i in range(len(x)):
        dominated = any(
            (x[j] >= x[i]).all() and (x[j] > x[i]).any() for j in range(len(x))
        )
        if not dominated:
            keep.append(rows[i][0])
    return sorted(keep)


def test_ties_survive_and_nulls_excluded(spark):
    df = spark.createDataFrame(
        [
            (1, 1.0, 10.0),
            (2, 1.0, 10.0),  # exact tie with 1: both survive
            (3, 2.0, 10.0),  # dominated by 1/2 (worse cost, equal gain)
            (4, 0.5, 5.0),   # incomparable with 1/2: survives
            (5, None, 99.0),  # null criterion: excluded entirely
        ],
        "id long, cost double, gain double",
    )
    out = sorted(
        r["id"] for r in skyline(df, [("cost", "min"), ("gain", "max")]).collect()
    )
    assert out == [1, 2, 4]


@pytest.mark.parametrize("n_parts", [1, 7])
def test_matches_bruteforce_across_partitionings(spark, n_parts):
    rng = np.random.default_rng(42)
    rows = [
        (i, float(a), float(b), float(c))
        for i, (a, b, c) in enumerate(rng.integers(0, 20, size=(300, 3)))
    ]
    signs = np.array([-1.0, 1.0, 1.0])  # min a, max b, max c
    expected = _brute(rows, signs)
    df = spark.createDataFrame(rows, "id long, a double, b double, c double").repartition(
        n_parts
    )
    got = sorted(
        r["id"]
        for r in skyline(df, [("a", "min"), ("b", "max"), ("c", "max")]).collect()
    )
    assert got == expected


def test_bad_direction_raises(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError):
        skyline(df, [("v", "upward")])
