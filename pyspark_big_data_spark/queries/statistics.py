"""Statistical aggregates, array aggregation, and unpivot/melt.

stddev/corr are computed from decimal-exact moment sums (sum, sum of
squares, sum of products) rather than the built-in accumulators — the
built-ins are numerically fine but order-dependent in the last bits,
which breaks cross-engine hash equality AND bit-reproducibility across
cluster re-plans. Same one-pass cost: all moments come from a single
partial+final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_DEC = "decimal(38,12)"


def _s(expr) -> F.Column:
    return F.sum(expr.cast(_DEC)).cast("double")


def _s_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,12))) AS DOUBLE)"


_STATS_ORACLE = f"""
WITH m AS (
    SELECT l_returnflag,
           COUNT(*) AS n,
           {_s_sql("l_quantity")} AS sx,
           {_s_sql("l_quantity * l_quantity")} AS sxx,
           {_s_sql("l_extendedprice")} AS sy,
           {_s_sql("l_extendedprice * l_extendedprice")} AS syy,
           {_s_sql("l_quantity * l_extendedprice")} AS sxy
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT l_returnflag,
       n,
       ROUND(sx / n, 6) AS mean_qty,
       ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
       ROUND((sxy - sx * sy / n)
             / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6) AS corr_qty_price
FROM m
ORDER BY l_returnflag
"""


@register("stats_by_returnflag", oracle=_STATS_ORACLE, driver=False)
def stats_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / sample stddev / Pearson correlation from exact moment sums
    (one aggregate pass; deterministic under any partitioning)."""
    li = read_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        _s(q).alias("sx"),
        _s(q * q).alias("sxx"),
        _s(p).alias("sy"),
        _s(p * p).alias("syy"),
        _s(q * p).alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ["n", "sx", "sxx", "sy", "syy", "sxy"])
    return m.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 6).alias("mean_qty"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("stddev_qty"),
        F.round(
            (sxy - sx * sy / n) / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)), 6
        ).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


_ARRAY_ORACLE = """
SELECT o_custkey,
       COUNT(*) AS n_orders,
       array_to_string(array_agg(o_orderkey ORDER BY o_orderkey), ',') AS orderkeys
FROM orders
WHERE o_custkey % 50 = 0
GROUP BY o_custkey
ORDER BY o_custkey
"""


@register("orders_per_customer_array", oracle=_ARRAY_ORACLE, driver=False)
def orders_per_customer_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list with deterministic ordering (sort_array) — emitted as
    a joined string so the oracle comparison is representation-proof.
    Unbounded collect_list is a scale hazard; the % 50 probe filter
    mirrors how you'd bound it (or use slice(sort_array(...), 1, k))."""
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.array_join(F.sort_array(F.collect_list("o_orderkey")), ",").alias("orderkeys"),
        )
        .orderBy("o_custkey")
    )


_UNPIVOT_ORACLE = """
WITH agg AS (
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(30,8))) AS DOUBLE) AS sum_disc
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, metric, value FROM (
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
)
ORDER BY l_returnflag, metric
"""


@register("unpivot_lineitem_metrics", oracle=_UNPIVOT_ORACLE, driver=False)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long reshaping with DataFrame.unpivot (melt)."""
    from pyspark_big_data_spark.functions.aggregates import dsum

    li = read_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_price"),
        dsum("l_discount", "sum_disc"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("l_returnflag", "metric")
