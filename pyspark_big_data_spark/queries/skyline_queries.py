"""Skyline (Pareto frontier) queries (operators/skyline.py).

Two registered rows pin the two-phase distributed skyline against the
quadratic NOT-EXISTS definition run by DuckDB — the oracle IS the
textbook dominance predicate, so any kernel bug (tie handling, sign
flip, a local phase that drops a global survivor) flips the row red:

- ``skyline_parts_price_size``: 2-criteria frontier over part
  (cheapest price for largest size).
- ``skyline_lineitem_3d``: 3-criteria frontier over lineitem
  (min extendedprice, max quantity, max discount) — exercises d>2
  dominance and a multi-partition local phase on the engine's biggest
  fact table.

The oracle's NOT EXISTS is O(n²) — fine at verification SF, and
exactly why the distributed operator exists for the 100 TB case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.operators.skyline import skyline
from pyspark_big_data_spark.queries.registry import register

_PART_ORACLE = """
SELECT p_partkey, p_size, p_retailprice
FROM part p
WHERE NOT EXISTS (
    SELECT 1 FROM part q
    WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
ORDER BY p_partkey
"""


@register("skyline_parts_price_size", oracle=_PART_ORACLE, driver=False)
def skyline_parts_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-dominated (price down, size up) parts."""
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_size", "p_retailprice")
    return skyline(
        part, criteria=[("p_retailprice", "min"), ("p_size", "max")]
    ).orderBy("p_partkey")


_LINEITEM_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
FROM lineitem p
WHERE NOT EXISTS (
    SELECT 1 FROM lineitem q
    WHERE q.l_extendedprice <= p.l_extendedprice
      AND q.l_quantity >= p.l_quantity
      AND q.l_discount >= p.l_discount
      AND (q.l_extendedprice < p.l_extendedprice
           OR q.l_quantity > p.l_quantity
           OR q.l_discount > p.l_discount))
ORDER BY l_orderkey, l_linenumber
"""


@register("skyline_lineitem_3d", oracle=_LINEITEM_ORACLE, driver=False)
def skyline_lineitem_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-criteria frontier: cheap, large, discounted line items."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    )
    return skyline(
        li,
        criteria=[
            ("l_extendedprice", "min"),
            ("l_quantity", "max"),
            ("l_discount", "max"),
        ],
    ).orderBy("l_orderkey", "l_linenumber")
