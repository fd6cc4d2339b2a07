"""Surrogate-key witness (operators/surrogate_keys.py).

Assigns dense ids to every customer ordered by (acctbal, custkey) via
the two-pass offset scheme and returns the full (sk, custkey) mapping
plus per-row acctbal — DuckDB recomputes the same assignment with a
plain ROW_NUMBER() OVER (ORDER BY ...), so a gap, a duplicate id, an
offset misaligned with its partition, or a tie broken differently
flips the row red. The Spark plan deliberately contains NO Window
node (asserted in tests): the whole point is dense global numbering
without the single-partition sort a global row_number needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.operators.surrogate_keys import assign_surrogate_keys
from pyspark_big_data_spark.queries.registry import register

_ORACLE = """
SELECT ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey) AS sk,
       c_custkey, c_acctbal
FROM customer
ORDER BY sk
"""


@register("surrogate_keys_customers", oracle=_ORACLE, driver=False)
def surrogate_keys_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 1..N ids by (acctbal, custkey), two-pass offsets."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    keyed = assign_surrogate_keys(
        cust, order_cols=["c_acctbal", "c_custkey"], key_col="sk", num_partitions=8
    )
    return keyed.select("sk", "c_custkey", "c_acctbal").orderBy("sk")
