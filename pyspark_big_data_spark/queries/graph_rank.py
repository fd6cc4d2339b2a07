"""PageRank over the customer->supplier trade graph.

The engine's second iterative-algorithm family next to k-means
(operators/kmeans.py) and connected components (operators/graph.py):
a damped PageRank with dangling-mass redistribution, run as
driver-looped DataFrame iterations with a GENERATED unrolled DuckDB
oracle — the kmeans_oracle_sql methodology applied to graph
propagation, so a fixed iteration count is differentially verified
bit-for-bit. (Corpus-quality pipelines run exactly this shape on the
web link graph — harmonic centrality / PageRank as a document-quality
prior.)

Determinism: every per-node sum (in-flowing contributions, dangling
mass) goes through DECIMAL(38,18) — order-independent and identical in
both engines (the kmeans trick); the per-iteration update is then a
fixed-order double expression.

Scale shape: one edges equi-join + one aggregate per iteration, both
keyed on node ids (high-cardinality, AQE-balanced); the dangling mass
is a 1-row aggregate attached by broadcast; each iteration's rank
frame is localCheckpoint-ed, which is what a production iterative
graph job does anyway (per-iteration materialization instead of
exponentially re-expanding lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_DAMP = 0.85
_ITERS = 3

_DEC = "decimal(38,18)"


def _dsum(col) -> F.Column:
    return F.sum(col.cast(_DEC)).cast("double")


def pagerank_oracle_sql(iters: int = _ITERS, damp: float = _DAMP) -> str:
    """Unrolled fixed-iteration PageRank in DuckDB, mirroring the
    DataFrame loop expression by expression."""
    parts = [
        f"""WITH e AS (
    SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), nodes AS (
    SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst AS node FROM e
), deg AS (
    SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY src
), nn AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
), pr0 AS (
    SELECT node, 1.0 / nn.n AS pr FROM nodes, nn
)"""
    ]
    for t in range(1, iters + 1):
        p = f"pr{t - 1}"
        parts.append(
            f""", s{t} AS (
    SELECT e.dst AS node,
           CAST(SUM(CAST(p.pr / deg.outdeg AS DECIMAL(38,18))) AS DOUBLE) AS s
    FROM e JOIN {p} p ON p.node = e.src JOIN deg ON deg.node = e.src
    GROUP BY e.dst
), dm{t} AS (
    SELECT COALESCE(CAST(SUM(CAST(p.pr AS DECIMAL(38,18))) AS DOUBLE), 0.0) AS m
    FROM {p} p LEFT JOIN deg ON deg.node = p.node
    WHERE deg.node IS NULL
), pr{t} AS (
    SELECT nodes.node,
           (1.0 - {damp}) / nn.n + {damp} * (COALESCE(s{t}.s, 0.0) + dm{t}.m / nn.n) AS pr
    FROM nodes CROSS JOIN nn CROSS JOIN dm{t}
    LEFT JOIN s{t} ON s{t}.node = nodes.node
)"""
        )
    parts.append(
        f"""
SELECT node,
       CAST(node % 2 = 1 AS BOOLEAN) AS is_supplier,
       ROUND(pr, 12) AS pagerank
FROM pr{iters}
ORDER BY node
"""
    )
    return "".join(parts)


@register("trade_pagerank", oracle=pagerank_oracle_sql())
def trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_ITERS}-iteration damped PageRank over the distinct
    customer->supplier edges of orders x lineitem (node ids namespaced
    even=customer / odd=supplier). Suppliers are pure sinks, so the
    dangling-mass term is what keeps total rank at 1 — its conservation
    is pinned in tests/test_graph_rank.py."""
    orders = read_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") * 2).alias("src"), "o_orderkey"
    )
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_suppkey") * 2 + 1).alias("dst")
    )
    e = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select("src", "dst")
        .distinct()
    )
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))

    pr = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("pr")
    ).localCheckpoint(eager=True)

    for _ in range(_ITERS):
        contrib = (
            e.join(pr.withColumnRenamed("node", "src_n"), F.col("src") == F.col("src_n"))
            .join(deg.withColumnRenamed("node", "deg_n"), F.col("src") == F.col("deg_n"))
            .groupBy(F.col("dst").alias("node"))
            .agg(_dsum(F.col("pr") / F.col("outdeg")).alias("s"))
        )
        dangling = (
            pr.join(deg, "node", "left_anti")
            .agg(F.coalesce(_dsum(F.col("pr")), F.lit(0.0)).alias("m"))
        )
        pr = (
            nodes.crossJoin(F.broadcast(nn))
            .crossJoin(F.broadcast(dangling))
            .join(contrib, "node", "left_outer")
            .select(
                "node",
                (
                    F.lit(1.0 - _DAMP) / F.col("n")
                    + F.lit(_DAMP)
                    * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("m") / F.col("n"))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )

    return pr.select(
        "node",
        (F.col("node") % 2 == 1).alias("is_supplier"),
        F.round("pr", 12).alias("pagerank"),
    ).orderBy("node")


# ---------------------------------------------------------------------------
# Label propagation (community detection) over the same trade graph
# ---------------------------------------------------------------------------

_LPA_ITERS = 3


def lpa_oracle_sql(iters: int = _LPA_ITERS) -> str:
    """Unrolled fixed-iteration synchronous label propagation in DuckDB,
    mirroring the DataFrame loop expression by expression. All-integer
    arithmetic: votes are counts, the winner is (max count, min label) —
    no float anywhere, so the oracle is trivially exact."""
    parts = [
        """WITH e AS (
    SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), und AS (
    SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
), lp0 AS (
    SELECT DISTINCT src AS node, src AS lbl FROM und
)"""
    ]
    for t in range(1, iters + 1):
        p = f"lp{t - 1}"
        parts.append(
            f""", v{t} AS (
    SELECT und.dst AS node, l.lbl AS lbl, COUNT(*) AS cnt
    FROM und JOIN {p} l ON l.node = und.src
    GROUP BY 1, 2
    UNION ALL
    SELECT node, lbl, 1 FROM {p}
), a{t} AS (
    SELECT node, lbl, SUM(cnt) AS cnt FROM v{t} GROUP BY 1, 2
), lp{t} AS (
    SELECT node, lbl FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, lbl ASC) AS rn
        FROM a{t}
    ) WHERE rn = 1
)"""
        )
    parts.append(
        f"""
SELECT node,
       CAST(node % 2 = 1 AS BOOLEAN) AS is_supplier,
       lbl AS community,
       COUNT(*) OVER (PARTITION BY lbl) AS community_size
FROM lp{iters}
ORDER BY node
"""
    )
    return "".join(parts)


@register("trade_communities", oracle=lpa_oracle_sql())
def trade_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_LPA_ITERS}-iteration synchronous label propagation over the
    undirected trade graph: each node adopts the most frequent label
    among its neighbors plus its own (tie-break: smallest label) —
    community detection as the third member of the iterative family
    next to PageRank and connected components.

    Everything is INTEGER arithmetic (vote counts, id labels), so
    Spark and the generated unrolled DuckDB oracle agree exactly with
    no decimal plumbing. Per iteration: one edges equi-join + one
    (node, label) count + one per-node argmax window — all keyed on
    node ids, AQE-balanced; labels localCheckpoint per iteration like
    the PageRank loop. Synchronous updates + fixed iterations keep the
    notorious LPA nondeterminism out entirely."""
    orders = read_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") * 2).alias("src"), "o_orderkey"
    )
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_suppkey") * 2 + 1).alias("dst")
    )
    e = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select("src", "dst")
        .distinct()
    )
    und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    lp = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window as W

    for _ in range(_LPA_ITERS):
        nbr = (
            und.join(lp.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        votes = nbr.unionByName(lp.select("node", "lbl", F.lit(1).alias("cnt")))
        agg = votes.groupBy("node", "lbl").agg(F.sum("cnt").alias("cnt"))
        w = W.partitionBy("node").orderBy(F.desc("cnt"), F.asc("lbl"))
        lp = (
            agg.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
            .localCheckpoint(eager=True)
        )
    return lp.select(
        "node",
        (F.col("node") % 2 == 1).alias("is_supplier"),
        F.col("lbl").alias("community"),
        F.count(F.lit(1)).over(W.partitionBy("lbl")).alias("community_size"),
    ).orderBy("node")
