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
