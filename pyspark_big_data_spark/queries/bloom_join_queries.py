"""Bloom semi-join reduction witness (operators/bloom_join.py).

Fact = lineitem; key set = the orderkeys of urgent high-value orders
(selective, so the pre-filter has something to cut). The row emits the
decimal-exact aggregate of the bloom-reduced semi-join plus a
``reduction_gate`` that is 1 only if the bloom candidate count landed
in [exact_matches, fact_total) — i.e. the pre-filter really was a
SUPERSET of the true matches (no false negatives: anything below the
exact count means lost rows) AND it actually pruned something. DuckDB
recomputes the aggregate from the plain IN-subquery semi-join, so a
false negative, a null key leaking through, or a dropped duplicate
fact row flips the values; a broken gate flips the gate column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.functions.aggregates import dsum
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_PRICE_FLOOR = 150000.0

_ORACLE = f"""
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS qty_sum,
       1 AS reduction_gate
FROM lineitem
WHERE l_orderkey IN (
    SELECT o_orderkey FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > {_PRICE_FLOOR}
)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("bloom_semi_join_witness", oracle=_ORACLE, driver=False)
def bloom_semi_join_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter semi-join, aggregate value pin + superset gate."""
    from pyspark_big_data_spark.operators.bloom_join import (
        bloom_prefilter,
        build_bloom,
    )

    fact = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    keys = (
        read_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > _PRICE_FLOOR)
        )
        .select("o_orderkey")
    )

    bits, bitmap = build_bloom(keys, "o_orderkey")
    candidates = bloom_prefilter(fact, "l_orderkey", bits, bitmap)
    exact = candidates.join(
        keys.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
        "l_orderkey",
        "leftsemi",
    )

    # gate: exact_matches <= candidates < fact_total (superset that pruned)
    n_fact = fact.count()
    n_cand = candidates.count()
    n_exact = exact.count()
    gate = 1 if n_exact <= n_cand < n_fact else 0

    return (
        exact.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity", "qty_sum"),
        )
        .withColumn("reduction_gate", F.lit(gate))
        .orderBy("l_returnflag")
    )
