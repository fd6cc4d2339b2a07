"""Grid radius join (operators/spatial.py) and frontier BFS
(operators/graph.py::bfs_shortest_hops) edge semantics. Oracle parity
pins the registered rows; these tests cover what the fixtures can't:
negative coordinates, boundary inclusivity, cycles, cutoffs.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_big_data_spark.operators.graph import bfs_shortest_hops
from pyspark_big_data_spark.operators.spatial import grid_radius_join


def _pairs(df):
    return sorted((r["id_a"], r["id_b"]) for r in df.collect())


def test_radius_join_boundaries_negatives_nulls(spark):
    pts = spark.createDataFrame(
        [
            (1, 0.0, 0.0),
            (2, 3.0, 4.0),   # dist 5.0 from 1: exactly on the radius -> kept
            (3, -0.5, -0.5), # negative coords (floor cell -1): near 1
            (4, 100.0, 100.0),  # far away
            (5, None, 1.0),  # null coordinate: excluded
        ],
        "id long, x double, y double",
    )
    got = _pairs(grid_radius_join(pts, "id", "x", "y", 5.0))
    # 1-2: dist exactly 5.0 (on the radius, kept); 1-3: 0.707;
    # 2-3: sqrt(32.5) = 5.70 > 5 (cut); 4 far; 5 null-excluded
    assert got == [(1, 2), (1, 3)]


def test_radius_join_no_duplicate_pairs(spark):
    # co-located points at a cell corner: every meeting must be unique
    pts = spark.createDataFrame(
        [(i, 1.0, 1.0) for i in range(4)], "id long, x double, y double"
    )
    out = _pairs(grid_radius_join(pts, "id", "x", "y", 1.0))
    assert out == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


@pytest.mark.parametrize("n_parts", [1, 5])
def test_radius_join_matches_bruteforce(spark, n_parts):
    rng = np.random.default_rng(7)
    xy = rng.uniform(-10, 10, size=(200, 2))
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(xy)]
    r = 1.5
    expected = sorted(
        (i, j)
        for i in range(len(rows))
        for j in range(i + 1, len(rows))
        if np.hypot(xy[i, 0] - xy[j, 0], xy[i, 1] - xy[j, 1]) <= r
    )
    df = spark.createDataFrame(rows, "id long, x double, y double").repartition(n_parts)
    assert _pairs(grid_radius_join(df, "id", "x", "y", r)) == expected


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_bfs_chain_cycle_and_cutoff(spark):
    # 1 -> 2 -> 3 -> 1 (cycle), 3 -> 4 -> 5, 9 isolated target
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (8, 9)])
    src = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_shortest_hops(e, src, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is 4 hops: cut; 9 unreachable
    # cycle must not shorten or loop: node 1 stays at 0, nothing revisits


def test_bfs_multi_source_takes_min(spark):
    e = _edges(spark, [(1, 2), (2, 3), (10, 3)])
    src = spark.createDataFrame([(1,), (10,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_shortest_hops(e, src, max_hops=4).collect()}
    assert got == {1: 0, 10: 0, 2: 1, 3: 1}  # 3 claimed at 1 via 10, not 2 via 1


# ---------------------------------------------------------------------------
# Triangle census (operators/graph.py::triangle_count)
# ---------------------------------------------------------------------------


def _tri(spark, pairs):
    from pyspark_big_data_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(pairs, "src long, dst long")
    return triangle_count(edges).collect()[0]


def test_triangle_count_known_graphs(spark):
    # K4: 4 triangles, 6 edges, 12 wedges, clustering 1.0
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = _tri(spark, k4)
    assert (r["n_edges"], r["n_wedges"], r["n_triangles"]) == (6, 12, 4)
    assert r["clustering"] == 1.0
    # path graph: no triangles
    r = _tri(spark, [(0, 1), (1, 2), (2, 3)])
    assert r["n_triangles"] == 0
    # star: many wedges, zero triangles
    r = _tri(spark, [(0, i) for i in range(1, 6)])
    assert (r["n_wedges"], r["n_triangles"]) == (10, 0)
    # triangle + pendant edge
    r = _tri(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    assert r["n_triangles"] == 1


def test_triangle_count_input_hygiene(spark):
    # duplicates, reversed duplicates, and self-loops don't change it
    messy = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2), (1, 2)]
    r = _tri(spark, messy)
    assert (r["n_edges"], r["n_triangles"]) == (3, 1)


def test_triangle_count_skewed_hub(spark):
    # hub + rim: triangles only where rim edges close the wedge; the
    # degree orientation makes the hub a pure destination
    pairs = [(0, i) for i in range(1, 9)] + [(1, 2), (3, 4)]
    r = _tri(spark, pairs)
    assert r["n_triangles"] == 2


def test_k_core_semantics(spark):
    from pyspark_big_data_spark.operators.graph import k_core

    # triangle + a tail: the 2-core is exactly the triangle — the tail
    # node 4 peels first, then 3 keeps its triangle degree
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    nodes, core_e, rounds, converged = k_core(edges, 2)
    assert converged
    assert sorted(r["node"] for r in nodes.collect()) == [1, 2, 3]
    assert core_e.count() == 3

    # cascading peel: a path hanging off the triangle peels node by
    # node — the loop must iterate, not single-pass filter
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)], "src long, dst long"
    )
    nodes, _, rounds, converged = k_core(edges, 2)
    assert converged and rounds >= 3
    assert sorted(r["node"] for r in nodes.collect()) == [1, 2, 3]

    # k above the max degree: empty core, still converged
    nodes, core_e, _, converged = k_core(edges, 5)
    assert converged and nodes.count() == 0 and core_e.count() == 0
