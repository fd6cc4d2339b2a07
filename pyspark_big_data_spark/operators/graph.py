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
