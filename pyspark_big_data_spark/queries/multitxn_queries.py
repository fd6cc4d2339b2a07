"""Multi-table atomic commit witness (operators/multitxn.py).

Publishes an orders+customer pair through the transaction log in two
transactions, then simulates the crash window (per-table data versions
written, the t=2 manifest NEVER renamed) and value-pins the
txn-resolved join against DuckDB replaying the same slices on the raw
tables. Gates: crash_gate (the half-written transaction is invisible —
latest txn unchanged, both tables still read their t=1 pins),
travel_gate (the t=0 pair still reads consistently after t=1), and
conflict_gate (a stale-pinned commit is refused with nothing
published). A transaction layer that lets a reader join a new orders
version against an old customer version — or publishes half a crash —
flips a gate; any row-level corruption flips the values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table, session_tmpdir
from pyspark_big_data_spark.queries.registry import register

_ORACLE = """
WITH live AS (
    SELECT * FROM orders WHERE o_orderkey % 4 IN (0, 1)
)
SELECT COUNT(*) AS n_orders,
       CAST(SUM(CAST(l.o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS rev_sum,
       COUNT(DISTINCT c.c_custkey) AS n_customers,
       1 AS crash_gate, 1 AS travel_gate, 1 AS conflict_gate
FROM live l JOIN customer c ON l.o_custkey = c.c_custkey
"""


@register("multi_table_txn_witness", oracle=_ORACLE, driver=False)
def multi_table_txn_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table WAP: both tables or neither, at every transaction.

    Extension surface (VERDICT r11 next-step #4); the reference engine
    (src/query1-4.py) is read-only."""
    from pyspark_big_data_spark.operators.multitxn import (
        TxnConflict,
        commit_txn,
        latest_txn,
        read_txn_table,
    )
    from pyspark_big_data_spark.operators.versioned import write_version

    g = session_tmpdir("multitxn_")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = read_table(spark, sf_dir, "customer").select("c_custkey")

    # t=0: the first slice of orders + the whole dim, atomically
    commit_txn(
        spark,
        g,
        {
            "orders": orders.filter(F.col("o_orderkey") % 4 == 0),
            "customer": customer,
        },
    )
    t0_orders = read_txn_table(spark, g, "orders").count()
    t0_customers = read_txn_table(spark, g, "customer").count()

    # t=1: append the second slice (orders only; customer pin carried)
    commit_txn(
        spark,
        g,
        {"orders": orders.filter(F.col("o_orderkey") % 4 == 1)},
        append=True,
    )

    # crash window: phase-1 data versions land on BOTH tables, the
    # manifest rename never happens — readers must not see any of it
    write_version(orders.limit(0), f"{g}/orders")
    write_version(customer.limit(0), f"{g}/customer")
    crash_gate = (
        1
        if (
            latest_txn(spark, g) == 1
            and read_txn_table(spark, g, "customer").count() == t0_customers
        )
        else 0
    )

    # time travel: the t=0 PAIR still reads consistently
    travel_gate = (
        1
        if (
            read_txn_table(spark, g, "orders", txn=0).count() == t0_orders
            and read_txn_table(spark, g, "customer", txn=0).count()
            == t0_customers
        )
        else 0
    )

    # a commit planned against t=0 is refused now that the group is at
    # t=1 — and refusal publishes nothing
    conflict_gate = 0
    try:
        commit_txn(spark, g, {"orders": orders.limit(1)}, expected_txn=0)
    except TxnConflict:
        conflict_gate = 1 if latest_txn(spark, g) == 1 else 0

    live = read_txn_table(spark, g, "orders").alias("l")
    dim = read_txn_table(spark, g, "customer").alias("c")
    return (
        live.join(dim, F.col("l.o_custkey") == F.col("c.c_custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
            .cast("double")
            .alias("rev_sum"),
            F.count_distinct("c_custkey").alias("n_customers"),
        )
        .select(
            "n_orders",
            "rev_sum",
            "n_customers",
            F.lit(crash_gate).alias("crash_gate"),
            F.lit(travel_gate).alias("travel_gate"),
            F.lit(conflict_gate).alias("conflict_gate"),
        )
    )
