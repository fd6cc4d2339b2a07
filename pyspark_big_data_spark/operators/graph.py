"""Connected components via iterative min-label propagation — the
cluster-resolution step after pairwise near-dup detection (pairs say
"A~B"; dedup needs the transitive closure: one surviving doc per
duplicate CLUSTER).

This is the engine's iterative-algorithm escape hatch done Spark-style:
a driver-side convergence loop over declarative join+aggregate steps
(no GraphX dependency, no RDDs). Each iteration: every node adopts the
minimum label among itself and its neighbors; fixpoint when no label
changes. Iterations = graph diameter (near-dup clusters are tiny, so
2-4 in practice).

Scale notes: each iteration is one shuffle keyed by node id; labels are
cached per iteration and the previous iteration is unpersisted (bounded
memory, truncated lineage). Component ids are min-node-id — deterministic
under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Return (id, component) with component = min node id reachable.

    ``nodes``: one column `node_col` (singletons allowed);
    ``edges``: undirected pairs in `src_col`/`dst_col`.
    """
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
    ).cache()

    # localCheckpoint (not cache): iterative self-referencing plans grow
    # exponentially in the optimizer otherwise — checkpointing truncates
    # lineage each round. On a cluster use checkpoint() with a reliable dir.
    labels = nodes.select(
        F.col(node_col).alias("id"), F.col(node_col).alias("component")
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["id"], "inner")
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["u"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # never silently return half-propagated labels: a component with
        # diameter > max_iterations would get WRONG cluster ids. For
        # huge-diameter graphs use connected_components_star below
        # (diameter-independent) instead of raising this limit.
        sym.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} iterations "
            f"({changed} labels still changing); raise max_iterations"
        )

    sym.unpersist()
    return labels


def merge_components_incremental(
    cluster_map: DataFrame,
    new_nodes: DataFrame,
    new_edges: DataFrame,
    node_col: str = "id",
    comp_col: str = "component",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Incrementally maintain min-id connected components: fold a batch
    of new nodes + new edges into a persisted (id, component) map
    WITHOUT re-running CC over the full graph.

    Contract: ``cluster_map`` holds every previously-seen node with
    component = min reachable node id (exactly what
    ``connected_components`` emits); ``new_nodes`` are ids not yet in
    the map; ``new_edges`` endpoints are new nodes and/or mapped ids
    (the incremental-dedup loop emits exactly old x new and new x new
    pairs). Returns the updated full map.

    Why it is exact: contracting each old endpoint to its component id
    preserves connectivity, and because component ids ARE min doc ids,
    the min-label of a merged component in the contracted graph equals
    the min over all constituent docs — the same label a full recompute
    assigns. So incremental == full recompute, which is what the
    registered oracle checks.

    Scale shape: CC runs only on the CONTRACTED graph (touched
    components + batch nodes — bounded by batch neighborhood, never
    corpus size); the map update is one broadcast join against the
    relabeled roots (tiny) plus an append of the batch rows. At 100 TB
    the map rewrite can be deferred by keeping the root-relabel table
    and resolving reads through it, compacting offline."""
    m = cluster_map.select(F.col(node_col).alias("id"), F.col(comp_col).alias("component"))
    ma = m.select(F.col("id").alias("_a"), F.col("component").alias("_ca"))
    mb = m.select(F.col("id").alias("_b"), F.col("component").alias("_cb"))
    contracted = (
        new_edges.select(F.col(src_col).alias("_a"), F.col(dst_col).alias("_b"))
        .join(ma, "_a", "left")
        .join(mb, "_b", "left")
        .select(
            F.coalesce("_ca", F.col("_a")).alias("u"),
            F.coalesce("_cb", F.col("_b")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    merge_nodes = (
        new_nodes.select(F.col(node_col).alias("id"))
        .unionByName(contracted.select(F.col("u").alias("id")))
        .unionByName(contracted.select(F.col("v").alias("id")))
        .distinct()
    )
    merged = connected_components(
        merge_nodes, contracted, node_col="id", src_col="u", dst_col="v"
    )
    # roots whose label changed: relabel the old map through a broadcast
    relabel = merged.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("old_root"), F.col("component").alias("new_root")
    )
    updated_old = m.join(
        F.broadcast(relabel), m["component"] == relabel["old_root"], "left"
    ).select("id", F.coalesce("new_root", F.col("component")).alias("component"))
    new_rows = (
        new_nodes.select(F.col(node_col).alias("id"))
        .join(
            merged.select(F.col("id").alias("nid"), F.col("component").alias("ncomp")),
            F.col("id") == F.col("nid"),
            "left",
        )
        .select("id", F.coalesce("ncomp", F.col("id")).alias("component"))
    )
    return updated_old.unionByName(new_rows)


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., 'Connected Components in
    MapReduce and Beyond', Algorithm 2): every node connects its LARGER
    neighbors to its minimum neighbor (or itself if smaller)."""
    sym = (
        e.select("u", "v")
        .unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least(F.col("u"), F.col("mv")).alias("m")
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round (Algorithm 3): direct every edge toward its
    smaller endpoint, then connect each node's SMALLER-or-equal
    neighbors (and itself) to the minimum of the neighborhood."""
    d = (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = d.groupBy("u").agg(F.min("v").alias("m"))  # all v < u, so min(N∪{u}) = min(v)
    return (
        d.join(mins, "u")
        .select(F.col("v").alias("n"), "m")
        .unionByName(mins.select(F.col("u").alias("n"), "m"))
        .filter(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_rounds: int = 30,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction — O(log^2 n) ROUNDS regardless of graph diameter, vs
    O(diameter) for min-label propagation. Use this when components can
    be long chains (URL redirect graphs, citation paths); propagation
    (``connected_components``) stays the default for near-dup clusters,
    whose diameters are tiny.

    Each round is two shuffles (neighborhood min + emit); the edge set
    provably shrinks toward a star forest where every node points at its
    component's minimum id. Same output contract as
    ``connected_components``: (id, component = min reachable node id),
    deterministic under any partitioning.
    """
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig: tuple[int, int] | None = None
    for _ in range(max_rounds):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # bit_xor: order-independent, never overflows (sum of hashes
        # would throw under ANSI mode); edges are distinct so xor
        # fingerprints the set
        sig_row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).first()
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} rounds"
        )

    # converged edge set is a star forest: u -> component root (min id);
    # nodes absent from it are singletons
    roots = e.groupBy("u").agg(F.min("v").alias("component"))
    return nodes.select(F.col(node_col).alias("id")).join(
        roots.select(F.col("u").alias("id"), "component"), "id", "left"
    ).select("id", F.coalesce("component", F.col("id")).alias("component"))


def bfs_shortest_hops(
    edges: DataFrame,
    sources: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    max_hops: int = 4,
) -> DataFrame:
    """Unweighted single/multi-source shortest hops, frontier BFS.

    ``edges`` is a DIRECTED edge list (pass both directions for an
    undirected graph); ``sources`` one column of start nodes. Returns
    ``(node, hops)`` for every node reachable within ``max_hops``,
    sources at 0. Minimality holds by construction — level-synchronous
    BFS visits each node first at its true distance, and the anti-join
    against the visited set refuses any later (longer) rediscovery, so
    no min-reduction over path enumerations is ever needed (that
    enumeration is exactly what explodes on cyclic graphs).

    Scale shape: per level, ONE equi-join frontier x edges keyed on the
    src node plus one distinct and one anti-join — all hash-partitioned
    on node ids; the frontier is localCheckpoint-ed each level (bounded
    lineage, same policy as the engine's other iterative loops). Total
    work is O(levels) shuffles over frontier-sized inputs, never the
    walk count.
    """
    visited = sources.select(F.col(sources.columns[0]).alias("node")).distinct()
    visited = visited.withColumn("hops", F.lit(0)).localCheckpoint(eager=True)
    frontier = visited.select("node")
    e = edges.select(F.col(src_col).alias("e_src"), F.col(dst_col).alias("e_dst"))
    for depth in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["e_src"])
            .select(F.col("e_dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(depth))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return visited.select(F.col("node").alias(node_col), "hops")


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Exact global triangle census of an undirected simple graph:
    one row ``(n_edges, n_wedges, n_triangles, clustering)``.

    The scale lever is DEGREE ORIENTATION (the standard distributed
    triangle trick): orient every undirected edge from its
    lower-(degree, id) endpoint to its higher one — a total order, so
    each triangle has exactly ONE vertex with two out-edges and is
    counted exactly once — then build wedges by self-joining the
    oriented edges on that apex and close them against the oriented
    edge set. Work is Σ out-degree², and orientation bounds out-degree
    by ~sqrt(2m) even when raw degrees are power-law: the celebrity
    node that would explode an id-ordered wedge join (deg² wedges)
    becomes the DESTINATION of almost all its edges instead. Three
    shuffles total: degree aggregate, wedge join on the apex, closing
    semi-join on the (lo, hi) pair.

    ``n_wedges`` (paths of length 2, from raw degrees) and the global
    clustering coefficient 3T/W ride along — the integer inputs are
    exact, so the one double division is bit-stable across engines.

    Input contract: ``edges`` holds each undirected edge at least once
    in either direction; self-loops and duplicates are removed here.
    Reference parity note: extension surface — the reference engine
    (src/query1-4.py) has no graph operators; this completes the graph
    family (PageRank / LPA / CC / BFS) with the subgraph-census shape.
    """
    # The canonical edge set appears FIVE times in the plans below
    # (degree union x2, orientation join, closing semi-join, edge
    # count) and itself embeds the caller's pair fan-out join — without
    # a persist Spark re-runs that fan-out per occurrence per action.
    # Same for deg (wedge total + both orientation sides) and oriented
    # (both wedge sides). All three are pinned for the function's
    # lifetime and released before returning; e and oriented are O(m),
    # deg O(n) — MEMORY_AND_DISK, so an edge set bigger than the cache
    # spills instead of OOMing.
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.col("lo").alias("node"))
        .unionByName(e.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .persist()
    )
    try:
        wedges_total = deg.agg(
            F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long").alias("w")
        )

        # orient lower-(deg, id) -> higher-(deg, id)
        dl = deg.select(F.col("node").alias("lo"), F.col("deg").alias("dlo"))
        dh = deg.select(F.col("node").alias("hi"), F.col("deg").alias("dhi"))
        keyed = e.join(dl, "lo").join(dh, "hi")
        fwd = (F.col("dlo") < F.col("dhi")) | (
            (F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))
        )
        oriented = keyed.select(
            F.when(fwd, F.col("lo")).otherwise(F.col("hi")).alias("u"),
            F.when(fwd, F.col("hi")).otherwise(F.col("lo")).alias("v"),
        ).persist()
        try:
            # wedges at the apex u: out-neighbor pairs (v < w by id),
            # closed against the UNDIRECTED canonical edge set (lo, hi)
            w1 = oriented.select(F.col("u").alias("apex"), F.col("v").alias("x"))
            w2 = oriented.select(F.col("u").alias("apex_b"), F.col("v").alias("y"))
            wedge = w1.join(
                w2, (F.col("apex") == F.col("apex_b")) & (F.col("x") < F.col("y"))
            ).select(F.col("x").alias("lo"), F.col("y").alias("hi"))
            tri = wedge.join(e, ["lo", "hi"], "left_semi").count()

            spark = edges.sparkSession
            n_edges = e.count()
            n_wedges = int(wedges_total.collect()[0]["w"] or 0)
        finally:
            oriented.unpersist()
    finally:
        deg.unpersist()
        e.unpersist()
    clustering = (3.0 * tri / n_wedges) if n_wedges else 0.0
    return spark.createDataFrame(
        [(n_edges, n_wedges, tri, clustering)],
        "n_edges long, n_wedges long, n_triangles long, clustering double",
    )


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 25,
) -> tuple[DataFrame, DataFrame, int, bool]:
    """k-core decomposition by synchronous peeling: repeatedly remove
    every node whose degree in the CURRENT subgraph is below ``k``
    (and the edges it carries) until nothing changes. Returns
    ``(core_nodes, core_edges, rounds, converged)`` — the maximal
    subgraph of minimum degree >= k, the classic graph-quality filter
    (a document/user that only connects to peeled-away periphery gets
    peeled too, which is why k-core is the standard spam/periphery cut
    for corpus graphs).

    Scale shape: each round is one degree aggregate + two semi-joins
    (both endpoint filters), all keyed shuffles on the node id; the
    frontier SHRINKS monotonically, so round cost falls. The loop
    localCheckpoints per round — iterative plans would otherwise stack
    lineage. Rounds are data-bounded (each round removes >= 1 node or
    stops), ``max_rounds`` is the runaway guard; ``converged`` is the
    honest flag callers must gate on. Edges are canonicalized
    (undirected, deduped, no self-loops) like triangle_count.
    Reference parity note: extension surface (the reference engine has
    no graph operators)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    e = (
        edges.select(F.col(src_col).alias("lo"), F.col(dst_col).alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .select(F.least("lo", "hi").alias("lo"), F.greatest("lo", "hi").alias("hi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = -1
    converged = False
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        # pinned: the count action and the next round's two semi-joins
        # all consume this frame — without the persist the degree
        # aggregate runs twice per round
        survivors = (
            e.select(F.col("lo").alias("node"))
            .unionByName(e.select(F.col("hi").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("node")
            .persist()
        )
        try:
            n_now = survivors.count()
            if n_now == n_nodes:
                converged = True
                break
            n_nodes = n_now
            e = (
                e.join(survivors.withColumnRenamed("node", "lo"), "lo", "left_semi")
                .join(survivors.withColumnRenamed("node", "hi"), "hi", "left_semi")
                .select("lo", "hi")
                .localCheckpoint(eager=True)
            )
        finally:
            survivors.unpersist()
    core_nodes = (
        e.select(F.col("lo").alias("node"))
        .unionByName(e.select(F.col("hi").alias("node")))
        .distinct()
    )
    return core_nodes, e, rounds, converged
