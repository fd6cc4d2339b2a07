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
