"""Spatial radius self-join over the synthetic customer plane
(operators/spatial.py).

Coordinates follow the engine's deterministic synthetic-fixture
convention (FIXTURES.md, same device as q4_distance): a planar
(x, y) in [0, 100)^2 derived arithmetically from c_custkey, identical
in Spark and DuckDB. The registered row pins the grid-bucketed join —
3x3 neighborhood explode + equi-join on the cell + exact refine —
against DuckDB running the quadratic pair definition, so a missed
neighbor cell, a double-counted mirrored pair, or an off-grid floor at
negative coordinates flips the row red. The sqrt/mul/add distance
chain is IEEE-exact and identically ordered on both engines, making
the <= radius cut itself bit-stable (no tolerance band needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.operators.spatial import grid_radius_join
from pyspark_big_data_spark.queries.registry import register

_RADIUS = 2.0
_X = "(c_custkey % 1000) / 10.0"
_Y = "((c_custkey * 7) % 1000) / 10.0"

_ORACLE = f"""
WITH pts AS (
    SELECT c_custkey AS id, {_X} AS x, {_Y} AS y FROM customer
)
SELECT a.id AS id_a, b.id AS id_b,
       ROUND(sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)), 6) AS dist
FROM pts a JOIN pts b ON a.id < b.id
WHERE sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) <= {_RADIUS}
ORDER BY id_a, id_b
"""


@register("spatial_radius_pairs", oracle=_ORACLE, driver=False)
def spatial_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within planar distance 2.0, grid-bucketed."""
    pts = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.expr(_X).alias("x"),
        F.expr(_Y).alias("y"),
    )
    pairs = grid_radius_join(pts, "id", "x", "y", _RADIUS)
    return pairs.select(
        "id_a", "id_b", F.round("dist", 6).alias("dist")
    ).orderBy("id_a", "id_b")
