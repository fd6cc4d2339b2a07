"""BFS shortest hops over the undirected trade graph
(operators/graph.py::bfs_shortest_hops).

Graph: the same customer(2k) <-> supplier(2k+1) trade edges as
trade_pagerank / trade_communities (orders x lineitem), materialized
in BOTH directions so paths alternate customer/supplier. Source: the
smallest customer node present in the edge set (computed relationally,
no driver collect).

The oracle is a DuckDB RECURSIVE CTE walking (node, depth) pairs with
UNION-distinct semantics (the frontier stays bounded by nodes x depth
instead of enumerating walks — enumerating walks through 600-degree
supplier hubs would be combinatorial) and taking MIN(depth) per node.
Spark's level-synchronous BFS claims each node at first visit; the two
must agree node-for-node, so a frontier that leaks a revisit, an edge
direction dropped, or an off-by-one hop guard flips the row red.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.operators.graph import bfs_shortest_hops
from pyspark_big_data_spark.queries.registry import register

_MAX_HOPS = 4

_ORACLE = f"""
WITH RECURSIVE e AS (
    SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), both_dirs AS (
    SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e
), start AS (
    SELECT MIN(src) AS node FROM e
), walk (node, d) AS (
    SELECT node, 0 FROM start
    UNION
    SELECT b.dst, w.d + 1
    FROM walk w JOIN both_dirs b ON b.src = w.node
    WHERE w.d < {_MAX_HOPS}
)
SELECT node, MIN(d) AS hops
FROM walk
GROUP BY node
ORDER BY node
"""


@register("bfs_trade_hops", oracle=_ORACLE, driver=False)
def bfs_trade_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance from the smallest customer node, <= 4 hops."""
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    both = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    source = e.agg(F.min("src").alias("node"))
    return bfs_shortest_hops(both, source, max_hops=_MAX_HOPS).orderBy("node")
