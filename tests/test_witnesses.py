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
