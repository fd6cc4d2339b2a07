"""Triangle counting / clustering-coefficient audit of the near-dup
pair graph — degree-ordered edge orientation (the distributed triangle
algorithm of Suri & Vassilvitskii WWW'11, "Counting triangles and the
curse of the last reducer").

Why this query exists in a dedup pipeline: duplicate-cluster resolution
(dedup_clusters) merges near-dup PAIRS transitively into components.
That is safe when components are cliquish (A~B, B~C and A~C all hold)
and risky when they are chains (A~B~C with A never verified against C —
the "semantic drift" failure of transitive dedup). The per-document
clustering coefficient 2T/(d(d-1)) measures exactly this: 1.0 means
every pair inside the neighborhood was independently detected, low
values flag chain-merged clusters to re-verify before dropping docs.

Algorithm (all-integer, deterministic):
- edges = the MinHash-LSH near-dup pairs (same pipeline as
  dedup_minhash_lsh, md5-portable so the oracle replays it);
- orient every edge from its (degree, id)-smaller endpoint to the
  larger — each triangle then has EXACTLY one node with two out-edges
  in it, so counting (u->v, u->w, v->w with v π-smaller than w) counts
  each triangle once;
- wedges are an equi-join of oriented edges on src, closure is an
  equi-join against the oriented edge set.

Scale design (100 TB): degree-ordering is the entire point — the wedge
bill is Σ outdeg², and orienting toward higher degree caps every
outdeg at O(sqrt(|E|)) (a high-degree hub gets IN-edges, never a huge
out-fan). That kills the "last reducer" skew that a naive
lowest-id orientation leaves on Zipf-degree graphs. Everything is
equi-joins on node ids; the near-dup edge set is output-sized
(bounded by the LSH bill already paid by dedup_minhash_lsh).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

import pyspark_big_data_spark.operators.dedup as DD
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.dedup import _AGREE, _dd_minhash_cte, _EST_THRESHOLD
from pyspark_big_data_spark.queries.registry import register

_TRI_ORACLE = f"""{_dd_minhash_cte()},
pairs AS (
    SELECT c.id_a AS u, c.id_b AS v
    FROM cand c
    JOIN sigs x ON x.doc_id = c.id_a
    JOIN sigs y ON y.doc_id = c.id_b
    WHERE ({_AGREE}) / {float(DD.NUM_HASHES)} >= {_EST_THRESHOLD}
),
tri AS (
    SELECT e1.u AS a, e1.v AS b, e2.v AS c
    FROM pairs e1
    JOIN pairs e2 ON e2.u = e1.v
    JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
),
tn AS (SELECT a AS id FROM tri UNION ALL SELECT b AS id FROM tri UNION ALL SELECT c AS id FROM tri),
tcnt AS (SELECT id, COUNT(*) AS t FROM tn GROUP BY id),
dn AS (SELECT u AS id FROM pairs UNION ALL SELECT v AS id FROM pairs),
deg AS (SELECT id, COUNT(*) AS d FROM dn GROUP BY id)
SELECT deg.id AS doc_id,
       CAST(deg.d AS BIGINT) AS degree,
       CAST(COALESCE(tcnt.t, 0) AS BIGINT) AS n_triangles,
       CASE WHEN deg.d >= 2
            THEN ROUND(2.0 * COALESCE(tcnt.t, 0) / (deg.d * (deg.d - 1)), 6)
            ELSE 0.0 END AS clust_coeff
FROM deg LEFT JOIN tcnt ON tcnt.id = deg.id
ORDER BY doc_id
"""


def count_triangles(edges: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """(a, b, c) triangle triples of an undirected simple edge list
    (each edge once, src < dst), via degree-ordered orientation."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    deg = (
        e.select(F.col("u").alias("id"))
        .unionByName(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient from (deg, id)-smaller endpoint to larger
    ed = (
        e.join(deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v")
    )
    ku = F.struct(F.col("du").alias("d"), F.col("u").alias("i"))
    kv = F.struct(F.col("dv").alias("d"), F.col("v").alias("i"))
    u_first = ku < kv
    oriented = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, kv).otherwise(ku).alias("dst_key"),
    )
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = (
        x.join(y, F.col("x.src") == F.col("y.src"))
        .filter(F.col("x.dst_key") < F.col("y.dst_key"))
        .select(
            F.col("x.src").alias("a"),
            F.col("x.dst").alias("b"),
            F.col("y.dst").alias("c"),
        )
    )
    closer = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    return wedges.join(closer, ["b", "c"])


@register("dedup_triangle_audit", oracle=_TRI_ORACLE, driver=False)
def dedup_triangle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document degree, triangle count, and clustering coefficient
    over the MinHash near-dup pair graph (module docstring: the
    transitive-merge safety audit). Oracle: DuckDB replays the pair
    pipeline and counts triangles by the canonical a<b<c triple join —
    an INDEPENDENT triangle algorithm, so agreement checks both the
    orientation argument and the closure join."""
    docs = read_table(spark, sf_dir, "documents")
    sigs = DD.minhash_signatures(DD.shingles(docs)).cache()
    edges = (
        DD.estimated_jaccard(DD.candidate_pairs(DD.band_keys(sigs)), sigs)
        .filter(F.col("est_jaccard") >= _EST_THRESHOLD)
        .select("id_a", "id_b")
    ).cache()
    tri = count_triangles(edges)
    tcnt = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    deg = (
        edges.select(F.col("id_a").alias("doc_id"))
        .unionByName(edges.select(F.col("id_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.join(tcnt, "doc_id", "left")
        .select(
            "doc_id",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    F.lit(2.0)
                    * F.coalesce(F.col("t"), F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clust_coeff"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Triangle census of the part co-purchase graph (r10): the
# subgraph-census member of the graph family, degree-oriented for scale
# ---------------------------------------------------------------------------

_TRI_ORACLE = """
WITH op AS (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem
), e AS (
    SELECT DISTINCT a.part AS lo, b.part AS hi
    FROM op a JOIN op b ON a.ok = b.ok AND a.part < b.part
), deg AS (
    SELECT node, COUNT(*) AS deg
    FROM (SELECT lo AS node FROM e UNION ALL SELECT hi AS node FROM e)
    GROUP BY node
), agg AS (
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges
    FROM deg
), t AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.lo = e1.hi
    JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
)
SELECT n_edges, n_wedges, n_triangles,
       3.0 * n_triangles / n_wedges AS clustering
FROM agg, t
"""


# The basket self-join is QUADRATIC in basket size (a basket of n items
# emits n(n-1)/2 pairs): a single 10^4-item basket alone is ~5*10^7
# edges. TPC-H baskets are <= 7 items, but the guard is what lets this
# query be pointed at an arbitrary corpus without silently detonating —
# the same input-size discipline the all-pairs ANN truth sides carry
# (r10 verdict, What's-wrong #2).
_MAX_BASKET_ITEMS = 1024


def _copurchase_edges(op: DataFrame, max_basket_items: int = _MAX_BASKET_ITEMS) -> DataFrame:
    """Ordered co-purchase pairs (src < dst) from (ok, part) basket
    rows, guarded: raises when any basket exceeds ``max_basket_items``
    (one cheap max-of-counts aggregate — metadata-scale next to the
    join it gates). Callers with genuinely huge baskets should cap or
    sample baskets upstream, explicitly."""
    biggest = (
        op.groupBy("ok")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]["mx"]
    )
    if biggest is not None and biggest > max_basket_items:
        raise ValueError(
            f"largest basket has {biggest} items (> {max_basket_items}); "
            f"the pair fan-out is quadratic (~{biggest * (biggest - 1) // 2} "
            "pairs from that basket alone) — cap or sample baskets before "
            "building co-purchase edges"
        )
    a = op.select("ok", F.col("part").alias("src"))
    b = op.select(F.col("ok").alias("ok_b"), F.col("part").alias("dst"))
    return a.join(
        b, (F.col("ok") == F.col("ok_b")) & (F.col("src") < F.col("dst"))
    ).select("src", "dst")


@register("copurchase_triangles", oracle=_TRI_ORACLE, driver=False)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle census of the part co-purchase graph (parts are
    adjacent when some order contains both): one row of (n_edges,
    n_wedges, n_triangles, global clustering 3T/W) — the
    subgraph-census shape next to the family's PageRank / LPA / CC /
    BFS rows, and the standard cohesion statistic for recommender
    graphs. The operator (operators/graph.py::triangle_count) counts
    via DEGREE ORIENTATION — each edge directed low-(deg,id) →
    high-(deg,id), wedges built at their unique apex, closed with one
    semi-join — so the work is Σ out-deg² with out-degree bounded
    ~sqrt(2m) even on power-law graphs, while DuckDB recounts the SAME
    invariant with the naive id-ordered 3-way self-join (a < b < c):
    two different algorithms, one number — an orientation that
    double-counts, drops apexes, or closes against the directed (not
    canonical) edge set flips the row red. The clustering division is
    one double op on exact integers, bit-stable across engines."""
    from pyspark_big_data_spark.operators.graph import triangle_count

    li = read_table(spark, sf_dir, "lineitem")
    # pinned: the basket-size guard and BOTH sides of the pair fan-out
    # join consume this distinct — unpinned it re-shuffles lineitem
    # three times. Released after triangle_count, whose result is a
    # collected 1-row frame (every action has already run).
    op = (
        li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part")
        )
        .distinct()
        .persist()
    )
    try:
        return triangle_count(_copurchase_edges(op))
    finally:
        op.unpersist()


# ---------------------------------------------------------------------------
# k-core of the co-purchase graph (r10): the periphery-peeling quality
# filter, Spark loop vs unrolled-CTE peel
# ---------------------------------------------------------------------------

_KCORE_K = 2
_KCORE_LAYERS = 10


def _kcore_oracle(k: int = _KCORE_K, layers: int = _KCORE_LAYERS) -> str:
    """Unrolled synchronous peel in DuckDB: layer t keeps the nodes
    whose degree in e{t-1} is >= k and induces e{t}. All-integer, so
    trivially exact; the fixpoint gate re-peels the last layer once
    more and checks nothing moves."""
    # every layer is AS MATERIALIZED: each references its predecessor
    # three times, and DuckDB would otherwise INLINE the references —
    # a 3^layers expansion that re-opens the parquet scan thousands of
    # times (observed as EMFILE at 10 layers)
    parts = [
        """WITH op AS MATERIALIZED (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem
), e0 AS MATERIALIZED (
    SELECT a.part AS lo, b.part AS hi
    FROM op a JOIN op b ON a.ok = b.ok AND a.part < b.part
    GROUP BY lo, hi HAVING COUNT(*) >= 2
)"""
    ]
    for t in range(1, layers + 1):
        p = f"e{t - 1}"
        parts.append(
            f""", n{t} AS MATERIALIZED (
    SELECT node FROM (
        SELECT lo AS node FROM {p} UNION ALL SELECT hi AS node FROM {p}
    ) GROUP BY node HAVING COUNT(*) >= {k}
), e{t} AS MATERIALIZED (
    SELECT {p}.lo, {p}.hi FROM {p}
    JOIN n{t} a ON {p}.lo = a.node
    JOIN n{t} b ON {p}.hi = b.node
)"""
        )
    last = f"e{layers}"
    parts.append(
        f""", nfin AS (
    SELECT node FROM (
        SELECT lo AS node FROM {last} UNION ALL SELECT hi AS node FROM {last}
    ) GROUP BY node HAVING COUNT(*) >= {k}
)
SELECT CAST((SELECT COUNT(*) FROM n{layers}) AS BIGINT) AS n_core_nodes,
       CAST((SELECT COUNT(*) FROM {last}) AS BIGINT) AS n_core_edges,
       CAST((SELECT COALESCE(SUM(node), 0) FROM n{layers}) AS BIGINT) AS node_id_sum,
       CAST((SELECT COUNT(*) FROM nfin) = (SELECT COUNT(*) FROM n{layers}) AS BIGINT)
           AS fixpoint_gate
"""
    )
    return "".join(parts)


@register("kcore_copurchase", oracle=_kcore_oracle(), driver=False)
def kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{k}-core of the part co-purchase graph (operators/graph.py::
    k_core): peel every part whose co-purchase degree in the CURRENT
    subgraph is below {k} until nothing moves — the maximal subgraph of
    minimum degree >= {k}, the standard periphery/spam cut for corpus
    graphs (a node kept only by peeled-away neighbors gets peeled
    too, which no single-pass degree filter can compute); edges are
    the support>=2 co-purchase pairs, the threshold that makes the
    peel cascade instead of keeping every basket clique. Emits the
    core's node census, edge census, and node-id sum (membership
    binding) plus ``fixpoint_gate`` = 1 iff the peel CONVERGED — the
    Spark side gates on its own converged flag AND the oracle re-peels
    its last layer once more, so a loop that stopped early or a
    DuckDB unroll shorter than the true peel depth flips the row red
    rather than comparing two half-peeled graphs. Spark runs the
    data-bounded loop (degree aggregate + two semi-joins per round,
    frontier shrinking, localCheckpoint per round); DuckDB replays it
    as {layers} unrolled all-integer CTE layers.""".format(
        k=_KCORE_K, layers=_KCORE_LAYERS
    )
    from pyspark_big_data_spark.operators.graph import k_core

    li = read_table(spark, sf_dir, "lineitem")
    # pinned across the guard + both fan-out join sides (see
    # copurchase_triangles); safe to release after k_core because its
    # edge frontier is eagerly localCheckpointed inside the loop
    op = (
        li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part")
        )
        .distinct()
        .persist()
    )
    # support >= 2 edges (pairs co-purchased in at least two orders):
    # the raw basket graph is clique-per-order and everything survives
    # a k=3 peel; the support threshold is what recommender pipelines
    # apply anyway, and it makes the peel CASCADE at driver scale
    edges = (
        _copurchase_edges(op)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
        .select("src", "dst")
    )

    try:
        nodes, core_edges, rounds, converged = k_core(
            edges, _KCORE_K, max_rounds=_KCORE_LAYERS + 2
        )
    finally:
        op.unpersist()
    stats = nodes.agg(
        F.count(F.lit(1)).alias("n_core_nodes"),
        F.coalesce(F.sum("node"), F.lit(0)).cast("long").alias("node_id_sum"),
    ).crossJoin(
        core_edges.agg(F.count(F.lit(1)).alias("n_core_edges"))
    )
    return stats.select(
        "n_core_nodes",
        "n_core_edges",
        "node_id_sum",
        F.lit(1 if converged else 0).cast("long").alias("fixpoint_gate"),
    )
