"""Window-function surface beyond the reference's single row_number
(SURVEY.md §2.5 notes: "no rank/dense_rank/lag/lead, default frame
only"). Each shape here is a standard analytics building block with a
DuckDB oracle; explicit frames (rowsBetween) are exercised.

Scale notes: all windows partition by a high-cardinality key (customer,
user) — balanced shuffles. The only global window (dense_rank over all
nations) operates on an aggregated 25-row input, never raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.functions.aggregates import dsum_sql
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_RUNNING_ORACLE = """
SELECT o_custkey,
       o_orderkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_spend
FROM orders
WHERE o_custkey % 10 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, order_seq
"""


@register("running_customer_spend", oracle=_RUNNING_ORACLE)
def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running total with an explicit rowsBetween frame
    (decimal-exact so the prefix sums are order-independent)."""
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("order_seq"),
        F.sum(F.col("o_totalprice").cast("decimal(30,8)")).over(frame).cast("double").alias(
            "running_spend"
        ),
    ).orderBy("o_custkey", "order_seq")


_LAG_ORACLE = """
SELECT user_id,
       event_id,
       CAST(date_diff('microsecond', LAG(ts) OVER w, ts) AS DOUBLE) / 1000000.0
           AS secs_since_prev,
       LEAD(event_type) OVER w AS next_event_type
FROM events
WHERE user_id % 20 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
"""


@register("event_gaps_lag_lead", oracle=_LAG_ORACLE)
def event_gaps_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: inter-event gap seconds and next event type per user."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer-microsecond subtraction, THEN divide: casting epoch seconds
    # to double first loses sub-microsecond precision at 1.7e9 magnitude
    gap = (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).cast(
        "double"
    ) / 1_000_000.0
    return ev.select(
        "user_id",
        "event_id",
        gap.alias("secs_since_prev"),
        F.lead("event_type").over(w).alias("next_event_type"),
    ).orderBy("user_id", "event_id")


_RANKS_ORACLE = f"""
WITH nat AS (
    SELECT n.n_name,
           {dsum_sql("c.c_acctbal", "total_bal")},
           COUNT(*) AS n_cust
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
)
SELECT n_name, total_bal, n_cust,
       CAST(RANK() OVER (ORDER BY n_cust DESC) AS BIGINT) AS cust_rank,
       CAST(DENSE_RANK() OVER (ORDER BY n_cust DESC) AS BIGINT) AS cust_dense_rank,
       CAST(NTILE(4) OVER (ORDER BY total_bal DESC, n_name) AS BIGINT) AS bal_quartile
FROM nat
ORDER BY n_name
"""


@register("nation_rank_dense_ntile", oracle=_RANKS_ORACLE, driver=False)
def nation_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank (gap vs no-gap on ties) and ntile quartiles over
    a pre-aggregated 25-row frame (global windows only ever see
    aggregates, never raw rows)."""
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    nat = (
        customer.join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(30,8)")).cast("double").alias("total_bal"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )
    by_cust = Window.orderBy(F.col("n_cust").desc())
    by_bal = Window.orderBy(F.col("total_bal").desc(), F.col("n_name"))
    return nat.select(
        "n_name",
        "total_bal",
        "n_cust",
        F.rank().over(by_cust).cast("long").alias("cust_rank"),
        F.dense_rank().over(by_cust).cast("long").alias("cust_dense_rank"),
        F.ntile(4).over(by_bal).cast("long").alias("bal_quartile"),
    ).orderBy("n_name")
