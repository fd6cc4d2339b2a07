"""DSIR importance resampling: selection-quality invariants on top of
the bit-exact oracle parity (test_oracle_parity covers the SQL twin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.dsir import _TOP_K, dsir_importance_weights


def test_dsir_upweights_the_target_slice(spark, sf_dir):
    """The defining DSIR property: documents from the target domain
    (lang='en') must score higher under the target-vs-raw hashed-n-gram
    likelihood ratio than the rest of the corpus, and the Gumbel-top-k
    sample must over-represent the target slice vs its base rate."""
    w = dsir_importance_weights(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = w.join(docs, "doc_id").cache()
    try:
        stats = {
            r["is_en"]: (r["mean_w"], r["n"])
            for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
            .agg(F.avg("logw").alias("mean_w"), F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert stats[True][0] > stats[False][0]

        n_docs = sum(n for _, n in stats.values())
        base_rate = stats[True][1] / n_docs
        sel = j.filter(F.col("sampled") == 1)
        n_sel = sel.count()
        assert n_sel == min(_TOP_K, n_docs)
        en_rate = sel.filter(F.col("lang") == "en").count() / n_sel
        assert en_rate > base_rate
    finally:
        j.unpersist()


def test_dsir_weight_is_a_sum_over_features(spark, sf_dir):
    """n_grams must equal the doc's unigram+bigram occurrence count
    (non-empty tokens; multiplicity counts) — the bag model's size."""
    from pyspark_big_data_spark.functions import text as TX

    w = dsir_importance_weights(spark, sf_dir).select("doc_id", "n_grams")
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", TX.tokens(F.col("text")).alias("arr")
    ).select(
        "doc_id",
        F.size(F.filter(F.col("arr"), lambda t: t != "")).alias("n_uni"),
        F.greatest(F.size("arr") - 1, F.lit(0)).alias("n_big"),
    )
    j = w.join(toks, "doc_id").filter(
        F.col("n_grams") != F.col("n_uni") + F.col("n_big")
    )
    assert j.count() == 0
