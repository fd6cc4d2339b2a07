"""Bucketed co-located join: same-bucketed tables join without any
shuffle Exchange — the write-once, join-many fact-table layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.operators.bucketing import bucketed_join, write_bucketed
from pyspark_big_data_spark.testing import physical_plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    write_bucketed(li, "t_li_bucketed", "l_orderkey", num_buckets=8)
    write_bucketed(orders, "t_ord_bucketed", "l_orderkey", num_buckets=8)
    # forbid broadcast so the bucketed path (not a broadcast) is exercised
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_li_bucketed", "t_ord_bucketed", "l_orderkey")
        plan = physical_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # correctness: equals the plain (shuffled) join
        plain = li.join(orders, "l_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_ord_bucketed")


def test_bucketed_minhash_index_probe_is_shuffle_free_on_index_side(spark, sf_dir):
    """The incremental-dedup economics at 100 TB: the batch probe join
    must read the bucketed band index WITHOUT an Exchange on the index
    side (only the small batch shuffles), and the bucketed path must
    produce exactly the plain incremental pair set."""
    from pyspark_big_data_spark.queries.dedup import (
        _INCR_MOD,
        batch_probe_candidates,
        build_minhash_index_table,
        dedup_minhash_incremental,
        incremental_pairs_bucketed,
    )
    from pyspark_big_data_spark.operators import dedup as DD

    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % _INCR_MOD != 0)
    batch = docs.filter(F.col("doc_id") % _INCR_MOD == 0)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        build_minhash_index_table(corpus, "t_mh_idx", num_buckets=8)

        batch_bands = DD.band_keys(DD.minhash_signatures(DD.shingles(batch))).withColumn(
            "bk", F.concat_ws(":", "band_no", "band")
        )
        cand = batch_probe_candidates(batch_bands, spark.table("t_mh_idx_bands"))
        plan = physical_plan(cand)
        assert "Bucketed: true" in plan, plan  # index scan is bucket-aligned
        # Spark prints "Bucketed: false (reason)" when it decides to
        # shuffle a bucketed table after all — demand it never does
        assert "Bucketed: false" not in plan, plan
        assert "SortMergeJoin" in plan

        got = {
            (r["id_a"], r["id_b"])
            for r in incremental_pairs_bucketed(spark, batch, "t_mh_idx").collect()
        }
        want = {
            (r["id_a"], r["id_b"]) for r in dedup_minhash_incremental(spark, sf_dir).collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_mh_idx_bands")
        spark.sql("DROP TABLE IF EXISTS t_mh_idx_sigs")
