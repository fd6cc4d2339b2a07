"""pyspark.ml-native LSH variants (MinHashLSH, BucketedRandomProjectionLSH).

The hand-rolled pipelines in operators/dedup.py and queries/similarity.py
exist because they are *oracle-able* (portable md5 arithmetic). These
wrappers are the stock-Spark alternative — ml-estimator API, JVM-native
hashing — kept API-compatible so a deployment can choose either.
Validated by recall tests against the exact pipelines
(tests/test_ml_lsh.py), not by SQL oracles (ml hash seeds have no DuckDB
twin).

Scale notes: approxSimilarityJoin is the distributed path (explode on
hash tables -> equi-join on buckets); approxNearestNeighbors is
driver-side per-query and only for interactive probes.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, HashingTF, MinHashLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, functions as F

from pyspark_big_data_spark.functions.text import normalize_text

_SEED = 42


def minhash_ml_near_dup(
    docs: DataFrame,
    jaccard_distance_max: float = 0.5,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Near-dup pairs via ml MinHashLSH over hashed token sets.

    Returns (id_a, id_b, jaccard_dist) with id_a < id_b.
    """
    toks = docs.select(
        "doc_id", F.split(normalize_text(F.col("text")), " ").alias("toks")
    )
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=num_features, binary=True)
    feats = tf.transform(toks).filter(F.expr("size(toks) > 0"))
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=_SEED)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, jaccard_distance_max, distCol="jaccard_dist")
    return (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            F.col("jaccard_dist"),
        )
    )


def brp_lsh_near_neighbors(
    emb: DataFrame,
    euclidean_max: float = 1.2,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
) -> DataFrame:
    """Embedding near-neighbor pairs via BucketedRandomProjectionLSH.

    For unit-norm vectors, euclidean d and cosine c relate as
    d^2 = 2(1-c), so euclidean_max=1.2 ~ cosine >= 0.28.
    Returns (id_a, id_b, eucl_dist) with id_a < id_b.
    """
    vecs = emb.select("vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("v"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="hashes", bucketLength=bucket_length,
        numHashTables=num_hash_tables, seed=_SEED,
    )
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, euclidean_max, distCol="eucl_dist")
    return (
        joined.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("id_a"),
            F.col("datasetB.vec_id").alias("id_b"),
            F.col("eucl_dist"),
        )
    )
