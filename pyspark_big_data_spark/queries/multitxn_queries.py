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


_STREAM_ORACLE = """
WITH facts AS (
    SELECT o_orderkey, o_orderkey % 3 AS slice, o_orderpriority, o_totalprice
    FROM orders
), byprio AS (
    SELECT slice, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS amt
    FROM facts GROUP BY slice, o_orderpriority
)
SELECT (SELECT COUNT(*) FROM facts) AS n_facts,
       (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
        FROM facts) AS facts_sum,
       (SELECT COUNT(*) FROM byprio) AS n_byprio,
       CAST((SELECT SUM(n) FROM byprio) AS BIGINT) AS byprio_total,
       CAST(1 AS BIGINT) AS atomic_gate,
       CAST(1 AS BIGINT) AS skip_gate
"""


@register("streaming_multitxn_replay_witness", oracle=_STREAM_ORACLE, driver=False)
def streaming_multitxn_replay_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once MULTI-TABLE streaming sink driver-verified
    (streaming/sinks.py::exactly_once_multi_table_sink over
    operators/multitxn.py): replay three order slices through a
    splitter fanning each micro-batch into a FACTS table and a
    per-batch BYPRIO aggregate table — both landing under ONE
    transaction manifest per batch — then redeliver a batch with
    corrupted content. Emits the txn-resolved counts/sums of both
    tables; DuckDB recomputes the fan-out declaratively, so a lost
    slice, a half-applied batch, or a re-applied redelivery flips the
    row red. Gates: ``atomic_gate`` = every committed transaction
    names BOTH tables and carries its writer_batch_id (no transaction
    ever advanced one table without the other); ``skip_gate`` = the
    corrupted redelivery added NO transaction and changed NO value."""
    from pyspark_big_data_spark.functions.aggregates import dsum
    from pyspark_big_data_spark.operators.multitxn import (
        list_txns,
        read_txn_table,
        txn_manifest,
    )
    from pyspark_big_data_spark.streaming.sinks import (
        exactly_once_multi_table_sink,
    )

    g = session_tmpdir("multitxn_sink_")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderkey") % 3).alias("slice"),
        "o_orderpriority",
        "o_totalprice",
    )

    def splitter(batch):
        byprio = batch.groupBy("slice", "o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
            .cast("double")
            .alias("amt"),
        )
        return {"facts": batch, "byprio": byprio}

    sink = exactly_once_multi_table_sink(g, splitter)
    for i in range(3):
        sink(orders.filter(F.col("slice") == i), i)

    txns_before = list_txns(spark, g)
    sum_before = read_txn_table(spark, g, "facts").agg(
        F.sum("o_totalprice").alias("s")
    ).collect()[0]["s"]
    # crash-redelivery with CORRUPTED content: only the id matters
    sink(
        orders.limit(5).withColumn("o_totalprice", F.lit(-1.0)),
        1,
    )
    skip_ok = (
        list_txns(spark, g) == txns_before
        and read_txn_table(spark, g, "facts")
        .agg(F.sum("o_totalprice").alias("s"))
        .collect()[0]["s"]
        == sum_before
    )
    atomic_ok = len(txns_before) == 3 and all(
        set(txn_manifest(spark, g, t)["tables"]) == {"facts", "byprio"}
        and "writer_batch_id" in txn_manifest(spark, g, t)
        for t in txns_before
    )

    facts = read_txn_table(spark, g, "facts")
    byprio = read_txn_table(spark, g, "byprio")
    f = facts.agg(
        F.count(F.lit(1)).alias("n_facts"), dsum("o_totalprice", "facts_sum")
    )
    b = byprio.agg(
        F.count(F.lit(1)).alias("n_byprio"),
        F.sum("n").cast("long").alias("byprio_total"),
    )
    return f.crossJoin(b).select(
        "n_facts",
        "facts_sum",
        "n_byprio",
        "byprio_total",
        F.lit(1 if atomic_ok else 0).cast("long").alias("atomic_gate"),
        F.lit(1 if skip_ok else 0).cast("long").alias("skip_gate"),
    )
