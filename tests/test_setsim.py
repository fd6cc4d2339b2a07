"""Prefix-filter set-similarity join: the integer-ceil prefix-length
formula, and the no-miss guarantee against an in-Spark brute force
(the DuckDB oracle repeats the same check cross-engine)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.setsim import _T_DEN, _T_NUM, jaccard_prefix_pairs


def test_integer_ceil_matches_math_ceil():
    """(2*t_num*n + 2*t_den - 1) // (2*t_den) == ceil(t_num/t_den * n)
    for every set size and the thresholds the module supports —
    the float-free boundary arithmetic both engines rely on."""
    for t_num, t_den in ((9, 10), (4, 5), (3, 5), (1, 2), (19, 20)):
        for n in range(1, 201):
            got = (n * 2 * t_num + (2 * t_den - 1)) // (2 * t_den)
            want = math.ceil(t_num * n / t_den)
            assert got == want, (t_num, t_den, n, got, want)
            # prefix length stays within [1, n]
            plen = n - got + 1
            assert 1 <= plen <= n


def test_no_misses_vs_spark_bruteforce(spark, sf_dir):
    """Prefix-filtered output == unfiltered all-pairs join (Spark-side
    witness of the theorem; the oracle asserts the same vs DuckDB)."""
    import pyspark_big_data_spark.operators.dedup as DD

    docs = read_table(spark, sf_dir, "documents")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_prefix_pairs(spark, sf_dir).collect()
    }
    sets = (
        DD.shingles(docs)
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_set("s").alias("toks"))
    )
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    brute = {
        (r["doc_a"], r["doc_b"])
        for r in (
            a.crossJoin(b)
            .filter(F.col("doc_a") < F.col("doc_b"))
            .filter(F.lit(_T_DEN) * inter >= F.lit(_T_NUM) * union)
            .collect()
        )
    }
    assert got == brute


def test_no_misses_property_on_random_corpora(spark):
    """Hypothesis: on arbitrary small corpora (including adversarial
    near-identical texts), the prefix-filtered join equals the all-pairs
    truth. Shingle sets vary wildly here — short texts, empty texts,
    heavy repetition — exactly the boundary shapes the fixture corpus
    never produces."""
    from hypothesis import HealthCheck, given, settings, strategies as st
    from pyspark.sql import functions as F

    import pyspark_big_data_spark.operators.dedup as DD
    from pyspark_big_data_spark.queries.setsim import _T_DEN, _T_NUM, prefix_filter_pairs

    words = st.sampled_from(["alpha", "beta", "gamma", "delta", "x"])
    texts = st.lists(
        st.lists(words, min_size=1, max_size=12).map(" ".join),
        min_size=2,
        max_size=6,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts)
    def check(ts):
        docs = spark.createDataFrame(list(enumerate(ts)), "doc_id long, text string")
        got = {
            (r["doc_a"], r["doc_b"]) for r in prefix_filter_pairs(docs).collect()
        }
        sets = (
            DD.shingles(docs)
            .distinct()
            .groupBy("doc_id")
            .agg(F.collect_set("s").alias("toks"))
        )
        a = sets.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
        b = sets.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
        inter = F.size(F.array_intersect("ta", "tb"))
        union = F.size("ta") + F.size("tb") - inter
        brute = {
            (r["doc_a"], r["doc_b"])
            for r in a.crossJoin(b)
            .filter(F.col("doc_a") < F.col("doc_b"))
            .filter(F.lit(_T_DEN) * inter >= F.lit(_T_NUM) * union)
            .collect()
        }
        assert got == brute, (ts, got, brute)

    check()
