"""pyspark.ml LSH variants registered as rows-only queries (ml hash
seeds have no DuckDB twin; recall vs the exact oracled pipelines is
asserted in tests/test_ml_lsh.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.operators.ml_lsh import brp_lsh_near_neighbors, minhash_ml_near_dup
from pyspark_big_data_spark.queries.registry import register


# driver=False: the 50-entry driver surface keeps oracled queries; these
# rows-only ml twins are verified by the pytest recall gate
# (tests/test_ml_lsh.py) and the PERFORMANCE.md recall table instead.
@register("dedup_minhash_ml", driver=False)  # rows-only
def dedup_minhash_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        minhash_ml_near_dup(docs, jaccard_distance_max=0.5)
        .select("id_a", "id_b", F.round("jaccard_dist", 6).alias("jaccard_dist"))
        .orderBy("id_a", "id_b")
    )


@register("ann_brp_lsh_ml", driver=False)  # rows-only (see note above)
def ann_brp_lsh_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return (
        brp_lsh_near_neighbors(emb, euclidean_max=1.2)
        .select("id_a", "id_b", F.round("eucl_dist", 6).alias("eucl_dist"))
        .orderBy("id_a", "id_b")
    )
