"""Semantic gates for the leakage-free split assignment and the
contrastive triplet miner (their oracle-parity rows run in
tests/test_oracle_parity.py's sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.queries.contrastive import (
    _N_NEG,
    _NEG_TAU,
    contrastive_triplets,
)
from pyspark_big_data_spark.queries.dedup import (
    dedup_minhash_lsh,
    split_assign_leakage_free,
    split_leakage_audit,
)


def test_cluster_keyed_split_has_zero_crossing_pairs(spark, sf_dir):
    """The constructive guarantee: under the cluster-keyed assignment,
    NO near-dup pair crosses the train/val boundary — both endpoints
    share a cluster, hence a split. (The naive doc-keyed split's
    crossing pairs are exactly what split_leakage_audit returns, and
    the fixture does produce some: contrast asserted below.)"""
    assign = split_assign_leakage_free(spark, sf_dir).select("doc_id", "split")
    pairs = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    crossing = (
        pairs.join(
            assign.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")), "id_a"
        )
        .join(assign.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")), "id_b")
        .filter(F.col("sa") != F.col("sb"))
    )
    assert crossing.count() == 0
    # non-vacuous: the naive split DOES leak on this fixture
    assert split_leakage_audit(spark, sf_dir).count() > 0


def test_split_assignment_is_cluster_constant_and_total(spark, sf_dir):
    assign = split_assign_leakage_free(spark, sf_dir)
    from pyspark_big_data_spark.io import read_table

    n_docs = read_table(spark, sf_dir, "documents").count()
    assert assign.count() == n_docs  # total: every doc gets a split
    n_mixed = (
        assign.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert n_mixed == 0  # constant within each duplicate cluster


def test_triplet_invariants(spark, sf_dir):
    t = contrastive_triplets(spark, sf_dir)
    rows = t.collect()
    assert rows, "no triplets mined on the fixture"
    per_anchor: dict[int, int] = {}
    for r in rows:
        per_anchor[r.anchor_id] = per_anchor.get(r.anchor_id, 0) + 1
        assert r.negative_id != r.positive_id
        assert r.negative_id != r.anchor_id and r.positive_id != r.anchor_id
        assert r.neg_cos < _NEG_TAU  # negatives sit below the near-dup band
        assert r.pos_cos >= r.neg_cos  # positive is the rank-1 neighbor
        assert 1 <= r.neg_rnk <= _N_NEG
    assert max(per_anchor.values()) <= _N_NEG


def test_windowed_mining_equals_exact_on_full_quota_anchors(spark, sf_dir):
    """Where the top-k window yields the full negative quota, the
    windowed miner's triplets are IDENTICAL to the full-ranking
    miner's (the windowed items precede anything outside the window
    under the same (cos desc, id asc) comparator)."""
    from pyspark_big_data_spark.queries.contrastive import contrastive_triplets_topk

    exact = {
        (r.anchor_id, r.neg_rnk): (r.positive_id, r.pos_cos, r.negative_id, r.neg_cos)
        for r in contrastive_triplets(spark, sf_dir).collect()
    }
    windowed = contrastive_triplets_topk(spark, sf_dir).collect()
    assert windowed, "windowed miner found nothing on the fixture"
    per_anchor: dict[int, int] = {}
    for r in windowed:
        per_anchor[r.anchor_id] = per_anchor.get(r.anchor_id, 0) + 1
    full_quota = {a for a, n in per_anchor.items() if n == _N_NEG}
    assert full_quota, "no anchor filled its quota inside the window"
    for r in windowed:
        if r.anchor_id in full_quota:
            assert exact[(r.anchor_id, r.neg_rnk)] == (
                r.positive_id,
                r.pos_cos,
                r.negative_id,
                r.neg_cos,
            )


def test_mine_triplets_from_topk_edge_cases(spark):
    """Hand-built ranked frame: sub-tau positives still pair, anchors
    with no sub-tau window items emit nothing, quota truncates."""
    from pyspark_big_data_spark.queries.contrastive import mine_triplets_from_topk

    rows = [
        # anchor 1: positive above tau, 4 negatives below tau -> quota 3
        (1, 10, 0.95, 1), (1, 11, 0.30, 2), (1, 12, 0.20, 3),
        (1, 13, 0.10, 4), (1, 14, 0.05, 5),
        # anchor 2: ALL window items above tau -> no negatives, no rows
        (2, 20, 0.99, 1), (2, 21, 0.90, 2), (2, 22, 0.85, 3),
        # anchor 3: positive itself below tau -> still the positive;
        # one eligible negative
        (3, 30, 0.25, 1), (3, 31, 0.15, 2),
    ]
    nb = spark.createDataFrame(rows, ["probe_id", "neighbor_id", "cosine", "rnk"])
    got = {
        (r.anchor_id, r.neg_rnk): (r.positive_id, r.negative_id)
        for r in mine_triplets_from_topk(nb).collect()
    }
    assert got == {
        (1, 1): (10, 11), (1, 2): (10, 12), (1, 3): (10, 13),
        (3, 1): (30, 31),
    }


def test_soft_dedup_weights_mass_equals_hard_dedup(spark, sf_dir):
    """The soft-dedup contract: per-doc weights are 1/|cluster|, so the
    total weighted mass equals the hard-dedup survivor count (one
    document's worth per duplicate cluster), every weight is in (0, 1],
    and weight is constant within a cluster."""
    from pyspark_big_data_spark.queries.dedup import dedup_soft_weights

    w = dedup_soft_weights(spark, sf_dir)
    agg = w.agg(
        F.sum(F.lit(1.0) / F.col("cluster_size")).alias("mass"),
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.min("weight").alias("wmin"),
        F.max("weight").alias("wmax"),
    ).collect()[0]
    assert abs(agg.mass - agg.n_clusters) < 1e-6
    assert 0.0 < agg.wmin and agg.wmax <= 1.0
    n_mixed = (
        w.groupBy("cluster_id")
        .agg(F.countDistinct("weight").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert n_mixed == 0


def test_split_from_map_equals_full_chain_and_is_projection(spark, sf_dir):
    """The steady-state assignment (projection over the persisted
    cluster map) must equal the full-chain recompute row for row, and
    its plan must be join-free and shuffle-light (one scan + hash —
    the 100 TB shape the query exists to demonstrate)."""
    from pyspark_big_data_spark.queries.dedup import (
        split_assign_from_map,
        split_assign_leakage_free,
    )
    from pyspark_big_data_spark.testing import physical_plan

    steady = split_assign_from_map(spark, sf_dir)
    full = split_assign_leakage_free(spark, sf_dir)
    assert sorted(map(tuple, steady.collect())) == sorted(map(tuple, full.collect()))
    plan = physical_plan(steady)
    for node in ("Join", "HashAggregate", "BroadcastExchange"):
        assert node not in plan, f"steady-state plan should be a projection: {node}"


def test_soft_weights_from_map_equals_full_chain_and_skips_corpus(spark, sf_dir):
    """The steady-state weighting (one window over the persisted
    cluster map) must equal the full-chain recompute row for row, and
    its plan must never touch the documents table — the map scan plus
    one cluster-keyed window is the whole 100 TB cost."""
    from pyspark_big_data_spark.queries.dedup import (
        dedup_soft_weights,
        dedup_soft_weights_from_map,
    )
    from pyspark_big_data_spark.testing import physical_plan

    steady = dedup_soft_weights_from_map(spark, sf_dir)
    full = dedup_soft_weights(spark, sf_dir)
    assert sorted(map(tuple, steady.collect())) == sorted(map(tuple, full.collect()))
    plan = physical_plan(steady)
    assert "documents" not in plan, "steady-state weighting must not rescan the corpus"
    assert "Join" not in plan, "steady-state weighting is scan + window, no join"
