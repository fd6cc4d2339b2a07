"""Grid-bucketed spatial radius join.

"All pairs of points within distance R" is the canonical spatial join.
The naive form is a non-equi self-join (quadratic; Spark would plan a
nested loop). The standard distributed plan — identical in spirit to
the engine's bucketed range join (queries/range_join.py) but in two
dimensions — snaps points to a square grid of cell size R:

1. every point gets a home cell ``(floor(x/R), floor(y/R))``,
2. ONE side is exploded to its 3x3 cell neighborhood,
3. an equi-join on the cell meets every candidate pair exactly once
   (the pair with id_a < id_b meets where a's exploded neighborhood
   covers b's home cell; the mirrored meeting is cut by the id order),
4. the exact Euclidean predicate refines candidates.

Correctness: cell size == R guarantees any pair within R differs by at
most one cell index per axis, so the 3x3 neighborhood is a superset of
every qualifying pair — the refine step makes the result exact, the
grid only prunes.

Scale: replication is a constant 9x on one side of cell-sized keys;
the join is shuffle-on-cell (never nested-loop) and candidate volume
is bounded by local density — dense cells are the spatial analogue of
skewed keys and get the same AQE treatment. The same algebra carries
to geodesic metrics by replacing the square grid with latitude-band
cells sized for the worst-case meridian convergence; this engine ships
the planar kernel (its coordinates fixture is planar-synthetic,
FIXTURES.md) and keeps the metric pluggable at the refine step.

The sqrt/mul/add chain is IEEE-exact and identically ordered in Spark
and DuckDB, so the quadratic SQL definition is a bit-exact oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def grid_radius_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
) -> DataFrame:
    """Exact (id_a, id_b, dist) pairs with Euclidean dist <= radius,
    id_a < id_b. Null coordinates are excluded (incomparable)."""
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    pts = (
        points.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.col(x_col).alias("x"),
            F.col(y_col).alias("y"),
            F.floor(F.col(x_col) / radius).alias("cx"),
            F.floor(F.col(y_col) / radius).alias("cy"),
        )
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = (
        pts.withColumn("o", F.explode(offsets))
        .select(
            F.col("id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("o.dx")).alias("cx"),
            (F.col("cy") + F.col("o.dy")).alias("cy"),
        )
    )
    home = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cx",
        "cy",
    )
    dist = F.sqrt(
        (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
        + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
    )
    return (
        probe.join(home, ["cx", "cy"])  # equi-join on the cell
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", dist)
        .filter(F.col("dist") <= radius)
        .select("id_a", "id_b", "dist")
    )
