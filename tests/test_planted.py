"""Planted-cluster SRP witness gates: the scale claim itself (recall >=
0.9 at a <=10% candidate bill on clustered input) plus bit-exact DuckDB
parity of the whole measurement."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.queries.planted import (
    _C,
    _THRESH,
    planted_embeddings,
    planted_lsh_recall_witness,
)
from pyspark_big_data_spark.testing import assert_query_matches_oracle


def test_planted_witness_meets_scale_bar_and_matches_oracle(spark, sf_dir):
    row = planted_lsh_recall_witness(spark, sf_dir).collect()[0]
    assert row["n_truth"] > 0
    assert row["recall"] >= 0.9, f"SRP recall {row['recall']} below the bar"
    assert row["bill"] <= 0.10, f"candidate bill {row['bill']} above 10% of all-pairs"
    assert_query_matches_oracle(spark, "planted_lsh_recall_witness", sf_dir)


def test_planted_geometry_separates_clusters(spark, sf_dir):
    """The fixture's load-bearing property: within-cluster cosines sit
    far above the truth threshold, cross-cluster far below — so 'truth
    pair' and 'same planted cluster' coincide almost exactly."""
    from pyspark_big_data_spark.queries.planted import planted_truth_pairs

    planted = planted_embeddings(spark, sf_dir)
    truth = planted_truth_pairs(planted)
    cross = truth.filter(F.col("id_a") % _C != F.col("id_b") % _C).count()
    n_truth = truth.count()
    assert n_truth > 0
    # cross-cluster truth pairs are rare tail events of the noise, never
    # the norm (the margin between ~0.93 within and ~0.15 cross)
    assert cross / n_truth < 0.05
    assert _THRESH == 0.4  # pinned: the same threshold the embedding tiers use
