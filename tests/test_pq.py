"""Product-quantization tier: recall floor vs exact L2 (the oracle
already pins bit-exact determinism; this pins USEFULNESS), and the
compression arithmetic."""

from __future__ import annotations

import numpy as np

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.pq import (
    _DIM,
    _K_CODES,
    _M,
    _PROBE_MOD,
    _SUB,
    ann_topk_pq,
)


def test_pq_constants_consistent():
    assert _M * _SUB == _DIM
    # codes are one byte each at K<=256: the 64x->32x compression claim
    assert _K_CODES <= 256


def test_pq_recall_floor_vs_exact_l2(spark, sf_dir):
    """recall@5 >= 0.5 against brute-force exact L2 on the sf0.001
    fixture (random embeddings, K = n/8 codebook-starved — the measured
    worst case; 0.76 at sf0.01, see the module docstring)."""
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in emb])
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    probes = ids[ids % _PROBE_MOD == 0]
    exact = {}
    for p in probes:
        d = ((X - X[ids == p][0]) ** 2).sum(axis=1)
        order = [i for i in np.lexsort((ids, d)) if ids[i] != p][:5]
        exact[p] = {ids[i] for i in order}

    got = ann_topk_pq(spark, sf_dir).collect()
    byp: dict = {}
    for r in got:
        byp.setdefault(r["probe_id"], set()).add(r["vec_id"])
    assert set(byp) == set(probes.tolist())
    assert all(len(v) == 5 for v in byp.values())
    recall = float(np.mean([len(byp[p] & exact[p]) / 5 for p in probes]))
    assert recall >= 0.5, f"recall@5 {recall:.3f} below floor"


def test_pq_prebuilt_probe_equals_from_scratch(spark, sf_dir):
    """The persisted-index probe (ann_topk_pq_prebuilt) must reproduce
    the in-query-training tier bit for bit — the artifact on disk IS
    what training would produce (same contract split_assign_from_map
    pins for the cluster map)."""
    from pyspark_big_data_spark.queries.pq import ann_topk_pq_prebuilt

    fresh = ann_topk_pq(spark, sf_dir).collect()
    prebuilt = ann_topk_pq_prebuilt(spark, sf_dir).collect()
    assert sorted(map(tuple, prebuilt)) == sorted(map(tuple, fresh))
