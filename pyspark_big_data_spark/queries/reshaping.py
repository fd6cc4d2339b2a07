"""Reshaping and temporal-join operators: PIVOT, ROLLUP hierarchies,
and as-of (nearest-prior-event) joins.

None of these exist in the reference (SURVEY.md §2.4: "no grouping
sets / cube / rollup"; §2.3: "no as-of joins") — they're engine
extensions with full oracles. The as-of join is the classic
time-series/feature-store operator; the implementation here is the
scale-friendly union+LOCF (last-observation-carried-forward) window
form, not a range join:

  union the two tagged streams, sort within each key by time, carry the
  most recent build-side attributes forward with last_value(ignorenulls),
  keep probe rows. One shuffle on the key, no range-join blowup, no
  per-key cartesian — this is how you as-of join 100 TB of events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

_PIVOT_ORACLE = f"""
SELECT n.n_name,
       {", ".join(
           f"COUNT(*) FILTER (WHERE c.c_mktsegment = '{s}') AS {s.lower()}"
           for s in _SEGMENTS
       )}
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n_name
"""


@register("pivot_segment_by_nation", oracle=_PIVOT_ORACLE)
def pivot_segment_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with an explicit value list — the explicit list
    matters at scale: without it Spark runs an extra distinct scan to
    discover pivot values."""
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    out = (
        customer.join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.count(F.lit(1)))
        .na.fill(0, [s for s in _SEGMENTS])
    )
    renamed = out.select(
        "n_name", *[F.col(s).cast("long").alias(s.lower()) for s in _SEGMENTS]
    )
    return renamed.orderBy("n_name")


_ROLLUP_ORACLE = """
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       COUNT(*) AS cnt,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS grouping_level
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


@register("rollup_lineitem_status", oracle=_ROLLUP_ORACLE, driver=False)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals (leaf -> subtotal -> grand total) with
    grouping() provenance — the hypertable-rollup shape: one pass,
    partial aggregation at every level."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("long")
            .alias("grouping_level"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "cnt",
            "grouping_level",
        )
        .orderBy("returnflag", "linestatus")
    )


_ASOF_ORACLE = """
SELECT e.event_id,
       e.user_id,
       o.o_orderkey AS last_orderkey,
       CAST(date_diff('microsecond', o.o_orderdate, e.ts) AS DOUBLE) / 1000000.0
           AS secs_since_order
FROM (SELECT * FROM events WHERE user_id % 25 = 0) e
ASOF JOIN (
    SELECT DISTINCT ON (o_custkey, o_orderdate) o_custkey, o_orderdate, o_orderkey
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
) o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY event_id
"""


@register("asof_join_last_order", oracle=_ASOF_ORACLE)
def asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the customer's most recent order at
    or before the event time (union + LOCF window — see module doc).

    Tie policy (mirrored in the oracle): among orders sharing the same
    (custkey, orderdate), the lowest orderkey wins; order rows sort
    before events at the same timestamp.
    """
    events = read_table(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    orders = read_table(spark, sf_dir, "orders")

    # dedup equal-timestamp orders per customer (deterministic tie-break)
    w_dedup = Window.partitionBy("o_custkey", "o_orderdate").orderBy("o_orderkey")
    orders_d = (
        orders.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey")
    )

    probe = events.select(
        F.col("user_id").alias("key"),
        F.col("ts").cast("timestamp_ntz").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp_ntz").alias("o_orderdate"),
    )
    build = orders_d.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        "o_orderdate",
    )
    merged = build.unionByName(probe)
    # order rows first at equal t (is_event asc) => '>=' as-of semantics
    w = (
        Window.partitionBy("key")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("o_orderdate", ignorenulls=True).over(w).alias("last_orderdate"),
    )
    return (
        carried.filter((F.col("is_event") == 1) & F.col("last_orderkey").isNotNull())
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            "last_orderkey",
            (
                (
                    F.unix_micros(F.col("t").cast("timestamp"))
                    - F.unix_micros(F.col("last_orderdate").cast("timestamp"))
                ).cast("double")
                / 1_000_000.0
            ).alias("secs_since_order"),
        )
        .orderBy("event_id")
    )
