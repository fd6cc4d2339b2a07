"""Materialized-view rewrite witnesses (operators/matview.py).

Two registered rows pin BOTH arms of the aggregate navigator:

- ``matview_rollup_orders``: a coarser GROUP BY served from the MV —
  the ``mv_served`` gate column is 1 only if the rewriter accepted the
  query AND every input file of the executed plan lives under the MV
  directory (i.e. the fact table was provably not rescanned). Values
  are pinned against DuckDB computing the same aggregate DIRECTLY from
  the base table, so the rewrite must be value-invisible.
- ``matview_fallback_distinct``: a COUNT(DISTINCT) the MV cannot
  derive — the navigator must REFUSE the MV (gate 0) and compute from
  base, pinning the "silently correct, never silently wrong" contract.

MV measure partials are decimal-exact sums, so rolling partials up is
bit-identical to aggregating base rows (functions/aggregates.py policy).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table, session_tmpdir
from pyspark_big_data_spark.operators.matview import answer_aggregate, create_matview
from pyspark_big_data_spark.queries.registry import register

_MV_CACHE: dict[str, str] = {}


def _orders_mv(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir) the fine-grained orders MV: grouped by
    (priority, status, order year), storing the full derivable measure
    set for o_totalprice."""
    if sf_dir in _MV_CACHE:
        return _MV_CACHE[sf_dir]
    mv_dir = session_tmpdir("orders_mv_")
    base = read_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    create_matview(
        base,
        mv_dir,
        group_cols=["o_orderpriority", "o_orderstatus", "o_year"],
        measures=[
            ("sum", "o_totalprice"),
            ("count", None),
            ("count", "o_totalprice"),
            ("min", "o_totalprice"),
            ("max", "o_totalprice"),
        ],
    )
    _MV_CACHE[sf_dir] = mv_dir
    return mv_dir


_ROLLUP_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS total_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price,
       MAX(o_totalprice) AS max_price,
       1 AS mv_served
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("matview_rollup_orders", oracle=_ROLLUP_ORACLE, driver=False)
def matview_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarser aggregate answered from the MV; fact-scan-free gate."""
    mv_dir = _orders_mv(spark, sf_dir)
    df, served = answer_aggregate(
        spark,
        mv_dir,
        group_cols=["o_orderpriority"],
        aggs={
            "n_orders": ("count", None),
            "total_price": ("sum", "o_totalprice"),
            "avg_price": ("avg", "o_totalprice"),
            "max_price": ("max", "o_totalprice"),
        },
        base_loader=lambda: read_table(spark, sf_dir, "orders"),
    )
    data_prefix = os.path.join(mv_dir, "data_v")  # any refresh epoch
    mv_only_scan = served and all(data_prefix in f for f in df.inputFiles())
    return df.withColumn("mv_served", F.lit(1 if mv_only_scan else 0)).orderBy(
        "o_orderpriority"
    )


_FALLBACK_ORACLE = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       0 AS mv_served
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("matview_fallback_distinct", oracle=_FALLBACK_ORACLE, driver=False)
def matview_fallback_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-derivable measure: the navigator must refuse the MV."""
    from pyspark_big_data_spark.operators.matview import rewrite_aggregate

    mv_dir = _orders_mv(spark, sf_dir)
    rewritten = rewrite_aggregate(
        spark, mv_dir, ["o_orderpriority"], {"n_customers": ("count_distinct", "o_custkey")}
    )
    refused = rewritten is None  # a distinct count is not re-aggregable from partials
    base = read_table(spark, sf_dir, "orders")
    return (
        base.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
        .withColumn("mv_served", F.lit(0 if refused else 1))
        .orderBy("o_orderpriority")
    )


_REFRESH_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS total_price,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       1 AS mv_served
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("matview_incremental_refresh", oracle=_REFRESH_ORACLE, driver=False)
def matview_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-only incremental MV maintenance: build the MV over the
    PRE-1997 half of orders only, fold the remaining rows in with
    refresh_incremental (decimal sums and counts add, min/max take
    least/greatest — valid because the delta is insert-only), then
    answer the priority rollup FROM THE REFRESHED PARTIALS. DuckDB
    aggregates the WHOLE orders table directly, so a group double-
    counted by the fold, a min/max lost in the full-outer combine, or
    a delta row missed entirely flips the row red. The mv_served gate
    additionally pins that the answer came from MV files, not a base
    rescan."""
    from pyspark_big_data_spark.operators.matview import refresh_incremental

    split = "1997-01-01"
    base = read_table(spark, sf_dir, "orders")
    old = base.filter(F.col("o_orderdate") < split)
    delta = base.filter(F.col("o_orderdate") >= split)

    mv_dir = session_tmpdir("orders_mv_incr_")
    create_matview(
        old.withColumn("o_year", F.year("o_orderdate")),
        mv_dir,
        group_cols=["o_orderpriority", "o_orderstatus", "o_year"],
        measures=[
            ("sum", "o_totalprice"),
            ("count", None),
            ("min", "o_totalprice"),
            ("max", "o_totalprice"),
        ],
    )
    refresh_incremental(
        spark, mv_dir, delta.withColumn("o_year", F.year("o_orderdate"))
    )

    df, served = answer_aggregate(
        spark,
        mv_dir,
        group_cols=["o_orderpriority"],
        aggs={
            "n_orders": ("count", None),
            "total_price": ("sum", "o_totalprice"),
            "min_price": ("min", "o_totalprice"),
            "max_price": ("max", "o_totalprice"),
        },
        base_loader=lambda: base,
    )
    data_prefix = os.path.join(mv_dir, "data_v")
    mv_only_scan = served and all(data_prefix in f for f in df.inputFiles())
    return df.withColumn("mv_served", F.lit(1 if mv_only_scan else 0)).orderBy(
        "o_orderpriority"
    )


_CDF_REFRESH_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS total_price,
       CAST(1 AS BIGINT) AS mv_served,
       CAST(1 AS BIGINT) AS feed_io_gate
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("matview_cdf_refresh_witness", oracle=_CDF_REFRESH_ORACLE, driver=False)
def matview_cdf_refresh_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production MV-maintenance LOOP composed end-to-end (r10):
    the base table is a VERSIONED CHAIN table (operators/versioned.py),
    new data lands as a file-level APPEND commit, and the materialized
    view refreshes itself from the CHANGE DATA FEED — never rescanning
    the base. Concretely: commit pre-1997 orders as v0, build the MV
    over the v0 read, append the remaining orders as v1 (O(delta)
    bytes), then feed ``table_changes(v0, v1)`` — which reads ONLY the
    delta directory — into ``refresh_incremental``. The priority
    rollup answered FROM THE REFRESHED PARTIALS must equal DuckDB's
    aggregate over the WHOLE orders table, so a feed that leaked base
    rows (double-count), missed delta rows, or a fold that corrupted
    untouched groups flips the row red. Gates: ``mv_served`` (the
    answer's file index is MV data only — no base rescan) and
    ``feed_io_gate`` (the refresh input's file index contains NO v0
    file — the O(changes) maintenance claim, checked on the real
    scan). This is the loop a 100 TB nightly rollup runs: append,
    read the feed, fold the partials; nothing in it is proportional
    to the base."""
    from pyspark_big_data_spark.io import session_tmpdir
    from pyspark_big_data_spark.operators.matview import refresh_incremental
    from pyspark_big_data_spark.operators.versioned import (
        append_version,
        read_version,
        table_changes,
        write_version,
    )

    split = "1997-01-01"
    orders = read_table(spark, sf_dir, "orders")
    table_root = session_tmpdir("mv_chain_orders_")
    v0 = write_version(orders.filter(F.col("o_orderdate") < split), table_root)
    mv_dir = session_tmpdir("orders_mv_cdf_")
    create_matview(
        read_version(spark, table_root, v0).withColumn(
            "o_year", F.year("o_orderdate")
        ),
        mv_dir,
        group_cols=["o_orderpriority", "o_orderstatus", "o_year"],
        measures=[("sum", "o_totalprice"), ("count", None)],
    )
    v1 = append_version(orders.filter(F.col("o_orderdate") >= split), table_root)

    feed = table_changes(spark, table_root, v0, v1).withColumn(
        "o_year", F.year("o_orderdate")
    )
    feed_io_ok = all(f"/v={v0}/" not in p for p in feed.inputFiles())
    refresh_incremental(spark, mv_dir, feed)

    df, served = answer_aggregate(
        spark,
        mv_dir,
        group_cols=["o_orderpriority"],
        aggs={
            "n_orders": ("count", None),
            "total_price": ("sum", "o_totalprice"),
        },
        base_loader=lambda: read_version(spark, table_root, v1),
    )
    data_prefix = os.path.join(mv_dir, "data_v")
    mv_only = served and all(data_prefix in f for f in df.inputFiles())
    return df.select(
        "o_orderpriority",
        "n_orders",
        "total_price",
        F.lit(1 if mv_only else 0).cast("long").alias("mv_served"),
        F.lit(1 if feed_io_ok else 0).cast("long").alias("feed_io_gate"),
    ).orderBy("o_orderpriority")
