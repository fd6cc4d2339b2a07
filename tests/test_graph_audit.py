"""count_triangles on known graphs: the orientation argument produces
each triangle exactly once, independent of the registered query's
near-dup edge set (which the DuckDB oracle cross-checks)."""

from __future__ import annotations

from pyspark_big_data_spark.queries.graph_audit import count_triangles


def _edges(spark, pairs):
    return spark.createDataFrame(sorted(pairs), "id_a long, id_b long")


def test_k4_has_four_triangles(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tri = count_triangles(_edges(spark, k4)).collect()
    assert len(tri) == 4
    triples = {tuple(sorted((r["a"], r["b"], r["c"]))) for r in tri}
    assert triples == {(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)}


def test_path_and_star_have_none(spark):
    path = [(i, i + 1) for i in range(5)]
    assert count_triangles(_edges(spark, path)).count() == 0
    star = [(0, i) for i in range(1, 6)]
    assert count_triangles(_edges(spark, star)).count() == 0


def test_two_disjoint_triangles(spark):
    e = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    tri = count_triangles(_edges(spark, e)).collect()
    triples = {tuple(sorted((r["a"], r["b"], r["c"]))) for r in tri}
    assert triples == {(0, 1, 2), (10, 11, 12)}


def test_copurchase_edge_build_guards_mega_baskets(spark):
    """The quadratic basket self-join refuses a basket beyond the cap
    instead of silently detonating (r10 verdict What's-wrong #2)."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from pyspark_big_data_spark.queries.graph_audit import _copurchase_edges

    mega = spark.range(0, 2000).select(
        F.lit(1).alias("ok"), F.col("id").alias("part")
    )
    with _pytest.raises(ValueError, match="quadratic"):
        _copurchase_edges(mega)
    # under the cap: pairs come through, guard silent
    small = spark.range(0, 5).select(F.lit(1).alias("ok"), F.col("id").alias("part"))
    assert _copurchase_edges(small).count() == 10
    assert _copurchase_edges(mega, max_basket_items=2000).count() == 2000 * 1999 // 2
