"""Recall checks: the ml-native LSH operators must find the true
near-duplicates that the exact (oracled) pipelines establish."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.operators.ml_lsh import brp_lsh_near_neighbors, minhash_ml_near_dup


def test_minhash_ml_finds_exact_duplicate_pairs(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    # ground truth: identical-token-multiset documents (jaccard distance 0)
    ml_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_ml_near_dup(docs, jaccard_distance_max=0.3).collect()
    }
    from pyspark_big_data_spark.functions.text import normalize_text

    norm = docs.select("doc_id", normalize_text(F.col("text")).alias("norm"))
    dup_groups = (
        norm.groupBy("norm").agg(F.collect_list("doc_id").alias("ids")).filter(F.size("ids") > 1)
    )
    truth = set()
    for row in dup_groups.collect():
        ids = sorted(row["ids"])
        truth.update((a, b) for i, a in enumerate(ids) for b in ids[i + 1 :])
    if truth:  # exact text dups exist at some SFs only
        assert truth <= ml_pairs
    assert all(a < b for a, b in ml_pairs)


def test_brp_lsh_recall_vs_exact(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    got = brp_lsh_near_neighbors(emb, euclidean_max=1.2, num_hash_tables=6)
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    # exact truth: cosine >= 0.4  <=>  eucl <= sqrt(2*0.6) ~ 1.095 < 1.2
    from pyspark_big_data_spark.queries.similarity import embedding_near_dup

    truth = {(r["id_a"], r["id_b"]) for r in embedding_near_dup(spark, sf_dir).collect()}
    if truth:
        recall = len(truth & pairs) / len(truth)
        assert recall >= 0.5, f"recall {recall}: {len(truth)} true, {len(pairs)} found"
