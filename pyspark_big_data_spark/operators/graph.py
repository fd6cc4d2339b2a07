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
        # diameter > max_iterations would get WRONG cluster ids. (For
        # huge-diameter graphs, switch to pointer-jumping large/small-star
        # — O(log n) rounds — before raising this limit.)
        sym.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} iterations "
            f"({changed} labels still changing); raise max_iterations"
        )

    sym.unpersist()
    return labels
