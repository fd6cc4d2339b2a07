"""Sorted export (operators/sorted_export.py): the verifier must
actually catch unsorted and overlapping layouts, not just bless the
happy path."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.operators.sorted_export import (
    verify_sorted_export,
    write_sorted,
)


def test_write_sorted_verifies_globally_sorted(spark, tmp_path):
    df = spark.createDataFrame(
        [((i * 37) % 1000, i) for i in range(1000)], "k long, payload long"
    )
    path = str(tmp_path / "ok")
    write_sorted(df, path, ["k", "payload"], num_files=5)
    v = verify_sorted_export(spark, path, ["k", "payload"])
    assert v["files_sorted_within"] and v["ranges_disjoint"]
    assert v["files"] >= 2  # actually range-split, not one big file
    assert spark.read.parquet(path).count() == 1000  # nothing lost


def test_verifier_flags_unsorted_files(spark, tmp_path):
    # same ranges, but written WITHOUT the within-partition sort
    df = spark.createDataFrame(
        [((i * 37) % 1000, i) for i in range(1000)], "k long, payload long"
    )
    path = str(tmp_path / "unsorted")
    df.repartitionByRange(5, "k").write.parquet(path)  # ranges ok, files shuffled
    v = verify_sorted_export(spark, path, ["k"])
    assert not v["files_sorted_within"]
    assert v["ranges_disjoint"]  # ranges still partitioned


def test_verifier_flags_overlapping_ranges(spark, tmp_path):
    # hash partitioning: each file internally sorted but ranges overlap
    df = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    path = str(tmp_path / "overlap")
    df.repartition(4, "k").sortWithinPartitions("k").write.parquet(path)
    v = verify_sorted_export(spark, path, ["k"])
    assert v["files_sorted_within"]
    assert not v["ranges_disjoint"]
