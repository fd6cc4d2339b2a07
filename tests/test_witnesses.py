"""Agreement-witness gates: every witness must report gate_ok=1 on the
real testdata AND flip to 0 under sabotage — a witness that cannot go
red verifies nothing.

The per-tier agreement levels themselves are pinned by the tier tests
(test_quantization / test_truncated_ann / test_clustering / test_ivfpq
/ test_operators); these tests pin the DIGEST layer that externalizes
them to the differential driver."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_big_data_spark.queries import ORACLES, REGISTRY
from pyspark_big_data_spark.queries.witnesses import tolerance_agreement_digest

_WITNESSES = [
    "ann_quantized_np_agreement",
    "ann_truncated_np_agreement",
    "ann_ivf_quantized_agreement",
    "kmeans_np_agreement",
    "semantic_multiprobe_np_agreement",
    "ann_ivfpq_witness",
    "user_overlap_sketch_witness",
    # r7-queue witnesses (driver=False this round; same digest contract)
    "minhash_fast_tier_witness",
    "pca_project_witness",
    "hll_distinct_witness",
    # continuation-session witnesses: the last unwitnessed rows-only
    # tiers (pyspark.ml LSH twins, learned-cell IVF, BLAS SemDeDup,
    # typed JSON parse)
    "semantic_dedup_np_agreement",
    "ann_ivf_kmeans_witness",
    "minhash_ml_witness",
    "brp_lsh_ml_witness",
    "json_typed_agreement",
    "approx_quantile_witness",
]


@pytest.mark.parametrize("name", _WITNESSES)
def test_witness_green_and_oracled(spark, sf_dir, name):
    row = REGISTRY[name](spark, sf_dir).collect()
    assert len(row) == 1
    assert row[0]["gate_ok"] == 1
    assert name in ORACLES  # every witness must be driver-verifiable


def _toy(spark, rows):
    return spark.createDataFrame(rows, "probe_id long, neighbor_id long, cosine double")


def test_tolerance_digest_goes_red_on_divergence(spark):
    exact = _toy(spark, [(1, 10, 0.9), (1, 11, 0.8), (2, 10, 0.7), (2, 12, 0.6)])
    # value divergence past tol on one of four keys (75% < 98% would
    # also trip overlap if keys differed; here keys match, value breaks)
    bad_val = _toy(spark, [(1, 10, 0.9), (1, 11, 0.8), (2, 10, 0.7), (2, 12, 0.61)])
    row = tolerance_agreement_digest(exact, bad_val, ["probe_id", "neighbor_id"]).first()
    assert row["gate_ok"] == 0 and row["n_exact"] == 4

    # dropped row: count mismatch
    dropped = _toy(spark, [(1, 10, 0.9), (1, 11, 0.8), (2, 10, 0.7)])
    assert (
        tolerance_agreement_digest(exact, dropped, ["probe_id", "neighbor_id"]).first()[
            "gate_ok"
        ]
        == 0
    )

    # same count, different keys: overlap breaks even without count_eq
    swapped = _toy(spark, [(1, 10, 0.9), (1, 11, 0.8), (2, 10, 0.7), (2, 13, 0.6)])
    assert (
        tolerance_agreement_digest(
            exact, swapped, ["probe_id", "neighbor_id"], require_count_eq=False
        ).first()["gate_ok"]
        == 0
    )

    # identical tiers: green
    assert (
        tolerance_agreement_digest(exact, exact, ["probe_id", "neighbor_id"]).first()[
            "gate_ok"
        ]
        == 1
    )


def test_kmeans_witness_goes_red_on_cluster_flips(spark, sf_dir, monkeypatch):
    """Flip >2% of the fast tier's assignments; the witness must go red."""
    from pyspark_big_data_spark.queries import clustering as C
    from pyspark_big_data_spark.queries.witnesses import kmeans_np_agreement

    real = C.kmeans_clusters_np

    def sabotaged(spark_, sf_dir_):
        df = real(spark_, sf_dir_)
        return df.withColumn(
            "cluster",
            F.when(F.col("vec_id") % 10 == 0, F.col("cluster") + 1).otherwise(
                F.col("cluster")
            ),
        )

    monkeypatch.setattr(C, "kmeans_clusters_np", sabotaged)
    assert kmeans_np_agreement(spark, sf_dir).first()["gate_ok"] == 0


def test_ivf_kmeans_witness_goes_red_on_empty_tier(spark, sf_dir, monkeypatch):
    """An IVF tier that answers nothing cannot beat the label tier's
    recall; the witness must go red."""
    from pyspark_big_data_spark.queries import ann_ivf as A
    from pyspark_big_data_spark.queries.witnesses import ann_ivf_kmeans_witness

    real = A.ann_topk_ivf_kmeans
    monkeypatch.setattr(
        A, "ann_topk_ivf_kmeans", lambda s, d: real(s, d).filter(F.lit(False))
    )
    assert ann_ivf_kmeans_witness(spark, sf_dir).first()["gate_ok"] == 0


def test_ivf_kmeans_witness_goes_red_on_cosine_divergence(spark, sf_dir, monkeypatch):
    from pyspark_big_data_spark.queries import ann_ivf as A
    from pyspark_big_data_spark.queries.witnesses import ann_ivf_kmeans_witness

    real = A.ann_topk_ivf_kmeans
    monkeypatch.setattr(
        A,
        "ann_topk_ivf_kmeans",
        lambda s, d: real(s, d).withColumn("cosine", F.col("cosine") + 1e-4),
    )
    assert ann_ivf_kmeans_witness(spark, sf_dir).first()["gate_ok"] == 0


def test_semantic_np_agreement_goes_red_on_dropped_pair(spark, sf_dir, monkeypatch):
    from pyspark_big_data_spark.queries import clustering as C
    from pyspark_big_data_spark.queries.witnesses import semantic_dedup_np_agreement

    real = C.semantic_dedup_np
    truth_n = C.semantic_dedup(spark, sf_dir).count()
    if truth_n == 0:
        pytest.skip("no semantic pairs at this SF")

    def sabotaged(spark_, sf_dir_):
        df = real(spark_, sf_dir_)
        first = df.orderBy("id_a", "id_b").first()
        return df.filter(
            ~((F.col("id_a") == first["id_a"]) & (F.col("id_b") == first["id_b"]))
        )

    monkeypatch.setattr(C, "semantic_dedup_np", sabotaged)
    assert semantic_dedup_np_agreement(spark, sf_dir).first()["gate_ok"] == 0


def test_ml_lsh_witnesses_go_red_on_lost_pairs(spark, sf_dir, monkeypatch):
    """Both pyspark.ml witnesses must flip when the ml tier loses its
    pairs — skipped when the SF has no truth pairs (vacuous gate)."""
    from pyspark_big_data_spark.operators import ml_lsh as ML
    from pyspark_big_data_spark.queries import witnesses as W

    brp_truth = (
        REGISTRY["embedding_near_dup"](spark, sf_dir).count()
        if "embedding_near_dup" in REGISTRY
        else 0
    )
    if brp_truth == 0:
        pytest.skip("no near-dup truth pairs at this SF")
    real_brp = ML.brp_lsh_near_neighbors
    monkeypatch.setattr(
        ML,
        "brp_lsh_near_neighbors",
        lambda emb, **kw: real_brp(emb, **kw).filter(F.lit(False)),
    )
    assert W.brp_lsh_ml_witness(spark, sf_dir).first()["gate_ok"] == 0


def test_minhash_ml_witness_goes_red_on_nonzero_distance(spark, sf_dir, monkeypatch):
    from pyspark.sql import SparkSession

    from pyspark_big_data_spark.functions.text import normalize_text
    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.operators import ml_lsh as ML
    from pyspark_big_data_spark.queries import witnesses as W

    docs = read_table(spark, sf_dir, "documents")
    n = docs.select(normalize_text(F.col("text")).alias("norm"))
    truth_n = n.groupBy("norm").count().filter(F.col("count") > 1).count()
    if truth_n == 0:
        pytest.skip("no exact-dup truth pairs at this SF")
    real = ML.minhash_ml_near_dup
    monkeypatch.setattr(
        ML,
        "minhash_ml_near_dup",
        lambda d, **kw: real(d, **kw).withColumn(
            "jaccard_dist", F.col("jaccard_dist") + 0.1
        ),
    )
    assert W.minhash_ml_witness(spark, sf_dir).first()["gate_ok"] == 0


def test_json_typed_agreement_goes_red_on_row_drift(spark, sf_dir, monkeypatch):
    from pyspark_big_data_spark.queries import semi_structured as S
    from pyspark_big_data_spark.queries.witnesses import json_typed_agreement

    real = S.json_props_typed
    monkeypatch.setattr(
        S,
        "json_props_typed",
        lambda s, d: real(s, d).withColumn("cnt", F.col("cnt") + 1),
    )
    assert json_typed_agreement(spark, sf_dir).first()["gate_ok"] == 0


def test_approx_quantile_witness_goes_red_on_bad_sketch(spark, sf_dir, monkeypatch):
    """A sketch that returns a grossly wrong element (the group MIN for
    every quantile) must fail the rank-interval gate."""
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.queries import statistics as S

    real = F.percentile_approx

    def bad(col, qs, acc):
        return F.array_repeat(F.min(col), len(S._AQ_QS))

    monkeypatch.setattr(
        "pyspark_big_data_spark.queries.statistics.F.percentile_approx", bad
    )
    row = S.approx_quantile_witness(spark, sf_dir).collect()[0]
    monkeypatch.setattr(
        "pyspark_big_data_spark.queries.statistics.F.percentile_approx", real
    )
    assert row["gate_ok"] == 0
