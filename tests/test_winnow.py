"""Winnowing fingerprint properties (operators/winnow.py).

The algorithm's contract (Schleimer-Wilkerson-Aiken): any common
substring of length >= k+w-1 between two documents yields at least one
shared fingerprint. Plus the short-document edge cases and the
normalization invariance the dedup pipelines rely on.
"""

from __future__ import annotations

from pyspark_big_data_spark.operators.winnow import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprint_rows,
)


def _fps(spark, texts: list[str]) -> dict[int, set[int]]:
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    out: dict[int, set[int]] = {i: set() for i in range(len(texts))}
    for r in winnow_fingerprint_rows(df).collect():
        out[r["doc_id"]].add(r["fp"])
    return out


def test_shared_substring_guarantee(spark):
    # docs share a substring far longer than k+w-1 -> MUST share a fp
    shared = "the quick brown fox jumps over the lazy dog"
    fps = _fps(spark, [f"alpha beta {shared} gamma", f"unrelated prefix {shared} and more"])
    assert fps[0] & fps[1], "guaranteed shared fingerprint missing"


def test_disjoint_docs_share_nothing(spark):
    fps = _fps(spark, ["aaaa bbbb cccc dddd eeee", "zzzz yyyy xxxx wwww vvvv"])
    assert not (fps[0] & fps[1])


def test_short_doc_edges(spark):
    too_short = "x" * (WINNOW_K - 1)  # no k-gram at all
    one_window = "abcdefghij"  # k <= len < k+w-1: min over all grams
    fps = _fps(spark, [too_short, one_window, ""])
    assert fps[0] == set()
    assert len(fps[1]) == 1
    assert fps[2] == set()


def test_normalization_invariance(spark):
    fps = _fps(spark, ["The  Quick   Brown Fox", "the quick brown fox"])
    assert fps[0] == fps[1]


def test_fingerprint_count_scales_with_length(spark):
    text = "word" + " word".join(str(i) for i in range(200))
    fps = _fps(spark, [text])
    n_grams = len(" ".join(text.lower().split())) - WINNOW_K + 1
    # winnowing density: expected ~2/(w+1) of windows distinct; just pin
    # the sane band (far fewer than grams, far more than a handful)
    assert n_grams // (4 * WINNOW_W) < len(fps[0]) < n_grams
