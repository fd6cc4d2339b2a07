"""Bloom semi-join reduction (operators/bloom_join.py)."""

from __future__ import annotations

import numpy as np

from pyspark_big_data_spark.operators.bloom_join import (
    _set_bits,
    _test_bits,
    bloom_prefilter,
    bloom_semi_join,
    build_bloom,
)


def test_kernel_has_no_false_negatives():
    rng = np.random.default_rng(3)
    keys = rng.integers(-(2**40), 2**40, size=5000)
    bits = 1 << 17
    arr = np.zeros(bits // 8, dtype=np.uint8)
    _set_bits(arr, keys, bits)
    assert _test_bits(arr, keys, bits).all()
    # and the filter actually filters: random probes mostly miss
    probes = rng.integers(2**41, 2**42, size=5000)
    assert _test_bits(arr, probes, bits).mean() < 0.05


def test_semi_join_equals_plain_semi_join(spark):
    fact = spark.createDataFrame(
        [(i % 100, f"p{i}") for i in range(1000)] + [(None, "nullkey")],
        "k long, payload string",
    )
    keys = spark.createDataFrame([(i,) for i in range(0, 100, 7)], "kk long")
    got = sorted(
        (r["k"], r["payload"])
        for r in bloom_semi_join(fact, "k", keys, "kk").collect()
    )
    expected = sorted(
        (r["k"], r["payload"])
        for r in fact.join(
            keys.withColumnRenamed("kk", "k").distinct(), "k", "leftsemi"
        ).collect()
    )
    assert got == expected and len(got) == 150  # 15 keys x 10 dup fact rows


def test_prefilter_is_superset_and_prunes(spark):
    fact = spark.createDataFrame([(i,) for i in range(10000)], "k long")
    keys = spark.createDataFrame([(i,) for i in range(0, 10000, 50)], "kk long")
    bits, bitmap = build_bloom(keys, "kk")
    n_cand = bloom_prefilter(fact, "k", bits, bitmap).count()
    assert 200 <= n_cand < 10000  # superset of the 200 matches, yet pruned
