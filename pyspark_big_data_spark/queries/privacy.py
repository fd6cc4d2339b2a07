"""Referential-pseudonymization witness (operators/pseudonymize.py).

Customer and orders are each pseudonymized on their customer key with
the SAME salt, then joined ON THE PSEUDONYMS — per-segment order
counts must equal the raw-key join's (referential integrity survives
the masking), distinct-pseudonym counts must equal distinct-key counts
(no collisions), and the lexicographic min pseudonym per segment pins
the md5 VALUES themselves against DuckDB recomputing
``md5(salt || '|' || key)`` — the masking is verifiable bit-for-bit,
not just count-for-count. The oracle uses ``||`` (null-propagating)
rather than concat (DuckDB's concat skips nulls), mirroring Spark's
null-in-null-out concat semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_SALT = "release-2026-08"

_ORACLE = f"""
WITH c AS (
    SELECT md5('{_SALT}' || '|' || CAST(c_custkey AS VARCHAR)) AS pseud,
           c_mktsegment
    FROM customer
), o AS (
    SELECT md5('{_SALT}' || '|' || CAST(o_custkey AS VARCHAR)) AS pseud
    FROM orders
)
SELECT c.c_mktsegment AS segment,
       COUNT(o.pseud) AS n_orders,
       COUNT(DISTINCT c.pseud) AS n_customers,
       MIN(c.pseud) AS min_pseudonym
FROM c LEFT JOIN o ON o.pseud = c.pseud
GROUP BY segment
ORDER BY segment
"""


@register("pseudonymize_referential_witness", oracle=_ORACLE, driver=False)
def pseudonymize_referential_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joins survive masking; pseudonym values pinned cross-engine."""
    from pyspark_big_data_spark.operators.pseudonymize import pseudonymize

    cust = pseudonymize(
        read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        ["c_custkey"],
        _SALT,
    ).withColumnRenamed("c_custkey", "pseud")
    orders = pseudonymize(
        read_table(spark, sf_dir, "orders").select("o_custkey"),
        ["o_custkey"],
        _SALT,
    ).withColumnRenamed("o_custkey", "o_pseud")

    return (
        cust.join(orders, cust["pseud"] == orders["o_pseud"], "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.col("o_pseud")).alias("n_orders"),
            F.countDistinct("pseud").alias("n_customers"),
            F.min("pseud").alias("min_pseudonym"),
        )
        .orderBy("segment")
    )
