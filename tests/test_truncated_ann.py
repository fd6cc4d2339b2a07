"""Recall + contract pins for the truncated-dim ANN tier (oracle
parity itself is covered by the test_oracle_parity sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import REGISTRY
from pyspark_big_data_spark.queries.truncated_ann import (
    _POOL,
    _TOP_K,
    _TRUNC_DIM,
    ann_topk_truncated,
    truncated_pool,
)


def _pairs(df):
    return {(r["probe_id"], r["neighbor_id"]) for r in df.collect()}


def test_truncated_output_contract(spark, sf_dir):
    rows = ann_topk_truncated(spark, sf_dir).collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        by_probe.setdefault(r["probe_id"], []).append(r)
    for probe, rs in by_probe.items():
        assert len(rs) == _TOP_K
        assert sorted(x["rnk"] for x in rs) == list(range(1, _TOP_K + 1))
        cosines = [x["cosine"] for x in sorted(rs, key=lambda x: x["rnk"])]
        assert cosines == sorted(cosines, reverse=True)
        assert all(x["neighbor_id"] != probe for x in rs)


def test_truncated_recall_floor(spark, sf_dir):
    """Pool recall vs the exact tier must hold the measured-table floor
    (prefix 32 / pool 6x -> 0.82 at sf0.01; leave slack for the tiny
    sf0.001 probe sample)."""
    exact = _pairs(REGISTRY["ann_topk_bruteforce"](spark, sf_dir))
    approx = _pairs(ann_topk_truncated(spark, sf_dir))
    assert len(approx & exact) / len(exact) >= 0.6


def test_wider_prefix_does_not_hurt_pool_recall(spark, sf_dir):
    """The knob must move the right way: a full-width 'prefix' pool
    contains every exact neighbor that any narrower prefix pool does
    (full width ranks by TRUE cosine, so its pool recall is the
    ceiling)."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    exact = _pairs(REGISTRY["ann_topk_bruteforce"](spark, sf_dir))
    dim = len(emb.first()["e"])
    narrow = _pairs(truncated_pool(emb, _TRUNC_DIM)) & exact
    full = _pairs(truncated_pool(emb, dim)) & exact
    assert len(full) >= len(narrow)
    # full-width pool of POOL*k > k candidates must contain the top-k
    assert len(full) == len(exact)


def test_truncated_np_tier_matches_oracled_tier(spark, sf_dir):
    """The prefix-GEMM twin shares the oracled tier's semantics (same
    prefix, same pool size, same rescore); divergence is limited to
    float-tied pool boundaries."""
    from pyspark_big_data_spark.queries.truncated_ann import ann_topk_truncated_np

    exact = {
        (r["probe_id"], r["neighbor_id"]): r["cosine"]
        for r in ann_topk_truncated(spark, sf_dir).collect()
    }
    fast = {
        (r["probe_id"], r["neighbor_id"]): r["cosine"]
        for r in ann_topk_truncated_np(spark, sf_dir).collect()
    }
    assert len(fast) == len(exact)
    overlap = set(exact) & set(fast)
    assert len(overlap) / len(exact) >= 0.98
    for key in overlap:
        assert abs(exact[key] - fast[key]) < 2e-6
