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
    """Runtime-filter semi-join, aggregate value pin + superset gate.

    Execution (r14; guide §1.2): TWO fact passes where there were
    four-plus — ``bloom_probe_counts`` prices n_fact AND n_candidates
    in one key-column pass, and the exact semi-join is evaluated ONCE
    by eagerly collecting its (returnflag-cardinality-bounded) group
    aggregate; n_exact is the sum of the collected group counts, so
    the separate exact count and the second full evaluation of the
    semi-join at materialization both disappear. Values identical:
    the collected aggregate rows ARE the result rows."""
    from pyspark_big_data_spark.operators.bloom_join import (
        bloom_prefilter,
        bloom_probe_counts,
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

    n_fact, n_cand = bloom_probe_counts(fact, "l_orderkey", bits, bitmap)
    agg_rows = (
        exact.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity", "qty_sum"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    n_exact = sum(int(r["n_items"]) for r in agg_rows)
    # gate: exact_matches <= candidates < fact_total (superset that pruned)
    gate = 1 if n_exact <= n_cand < n_fact else 0

    out = spark.createDataFrame(
        agg_rows, schema="l_returnflag string, n_items long, qty_sum double"
    )
    return out.withColumn("reduction_gate", F.lit(gate)).orderBy("l_returnflag")
