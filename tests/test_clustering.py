"""Lloyd k-means + SemDeDup invariants (the differential parity itself is
covered by tests/test_oracle_parity.py over the generated oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.operators import kmeans as KM
from pyspark_big_data_spark.queries.clustering import _K, semantic_dedup
from pyspark_big_data_spark.queries.similarity import embedding_near_dup


def _emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )


def test_kmeans_covers_all_vectors_with_at_most_k_clusters(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    assign = KM.kmeans_assignments(emb, k=_K, iters=3)
    assert assign.count() == emb.count()  # every vector labeled exactly once
    assert assign.select("cluster").distinct().count() <= _K


def test_kmeans_partitioning_invariant(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a = dict(KM.kmeans_assignments(emb, k=_K, iters=3).collect())
    b = dict(KM.kmeans_assignments(emb.repartition(13), k=_K, iters=3).collect())
    assert a == b  # decimal-exact sums: layout cannot flip an argmin


def test_kmeans_iterations_reduce_or_hold_inertia(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    pv = KM.long_form(emb)

    def inertia(iters: int) -> float:
        assign = KM.kmeans_assignments(emb, k=_K, iters=iters)
        cent = (
            pv.join(assign, "vec_id")
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("cval"))
        )
        return (
            pv.join(assign, "vec_id")
            .join(cent, ["cluster", "pos"])
            .select(((F.col("val") - F.col("cval")) ** 2).alias("sq"))
            .agg(F.sum("sq"))
            .collect()[0][0]
        )

    assert inertia(3) <= inertia(1) + 1e-9  # Lloyd is monotone in inertia


def test_semantic_dedup_pairs_are_subset_of_exact_witness(spark, sf_dir):
    sem = {
        (r["id_a"], r["id_b"]) for r in semantic_dedup(spark, sf_dir).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]) for r in embedding_near_dup(spark, sf_dir).collect()
    }
    # within-cluster comparison can only MISS pairs, never invent them
    assert sem <= exact
    if exact:
        recall = len(sem) / len(exact)
        assert recall > 0  # on this corpus some planted pairs co-cluster


def test_semantic_dedup_np_tier_matches_exact(spark, sf_dir):
    from pyspark_big_data_spark.queries.clustering import semantic_dedup_np

    exact = {
        (r["id_a"], r["id_b"]): r["cosine"] for r in semantic_dedup(spark, sf_dir).collect()
    }
    fast = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in semantic_dedup_np(spark, sf_dir).collect()
    }
    # BLAS vs sequential-fold sums differ in last ulps, which can only
    # flip pairs whose cosine ties the threshold to ~1e-12 — demand
    # near-total agreement and 6dp cosine agreement on the overlap
    overlap = set(exact) & set(fast)
    if exact or fast:
        assert len(overlap) / max(len(exact), len(fast)) >= 0.98
    for key in overlap:
        assert abs(exact[key] - fast[key]) < 2e-6


def test_kmeans_np_tier_agrees_with_exact(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    exact = dict(KM.kmeans_assignments(emb, k=_K, iters=3).collect())
    fast = dict(KM.kmeans_assignments_np(emb, k=_K, iters=3).collect())
    assert set(exact) == set(fast)  # every vector assigned in both tiers
    # double-vs-decimal sums can flip only near-tied argmins
    agree = sum(1 for v in exact if exact[v] == fast[v]) / len(exact)
    assert agree >= 0.98


def test_multiprobe_recall_floor(spark, sf_dir):
    """The multi-probe tier must recover >= 90% of the exact all-pairs
    near-dup truth (hard assignment measures 0.30-0.46 here — the
    cross-cluster split multi-probe exists to fix). Also a witness
    subset: every emitted pair must be true (cosine filter is exact)."""
    from pyspark_big_data_spark.queries.clustering import semantic_dedup_multiprobe
    from pyspark_big_data_spark.queries.similarity import embedding_near_dup

    truth = {(r["id_a"], r["id_b"]) for r in embedding_near_dup(spark, sf_dir).collect()}
    mp = {(r["id_a"], r["id_b"]) for r in semantic_dedup_multiprobe(spark, sf_dir).collect()}
    assert mp <= truth
    assert len(mp & truth) / len(truth) >= 0.9


def test_multiprobe_k_schedule():
    """The schedule must return the oracle's k at every oracle-checked
    SF (500 and 2000 vectors) and grow k ∝ n beyond, keeping cells near
    _CELL_TARGET rows so the Σ cell² bill is linear in n."""
    from pyspark_big_data_spark.queries.clustering import _CELL_TARGET, _k_for

    assert _k_for(500) == _K  # sf0.001 / sf0.01
    assert _k_for(2000) == _K  # sf0.1
    assert _k_for(20_000) == 20_000 // _CELL_TARGET  # native sf1 → 66
    assert _k_for(60_000) == 60_000 // _CELL_TARGET  # native sf3 → 200
    # linearity: doubling n doubles k (within integer floor)
    assert abs(_k_for(40_000) - 2 * _k_for(20_000)) <= 1


def test_multiprobe_np_tier_matches_exact(spark, sf_dir):
    """The BLAS multi-probe tier must reproduce the oracled multi-probe
    pair set (float summation order aside: near-total agreement, 6dp
    cosine agreement on the overlap)."""
    from pyspark_big_data_spark.queries.clustering import (
        semantic_dedup_multiprobe,
        semantic_dedup_multiprobe_np,
    )

    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in semantic_dedup_multiprobe(spark, sf_dir).collect()
    }
    fast = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in semantic_dedup_multiprobe_np(spark, sf_dir).collect()
    }
    overlap = set(exact) & set(fast)
    assert len(fast) == len(exact)
    assert len(overlap) / len(exact) >= 0.98
    for key in overlap:
        assert abs(exact[key] - fast[key]) < 2e-6
