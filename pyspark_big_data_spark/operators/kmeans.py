"""DataFrame-native Lloyd k-means — the clustering stage of a semantic
dedup / IVF pipeline, done as declarative plans in a driver loop.

Like ``operators/graph.py`` (the other iterative algorithm in the
engine), the iteration count lives on the driver while every step is a
join + aggregate Catalyst can optimize: no RDDs, no custom partitioners.

Determinism is the whole design:
- init: centroids are the k vectors with the SMALLEST ids (no RNG —
  reproducible across engines and runs; k-means++ would trade this
  for quality and is noted, not implemented, because the DuckDB
  differential oracle must replay the exact fixpoint path);
- cluster ids are the seed vector ids (stable labels, no re-ranking);
- distances: squared L2 accumulated decimal-exact (each double term
  cast to DECIMAL(38,18) before summing) so Spark's partial aggregates
  and DuckDB's sequential scan produce bit-identical doubles and the
  argmin can never flip between engines;
- argmin tie-break on (distance, cid).

Scale notes: centroids are k x dim rows — broadcast; each iteration is
two shuffles (argmin groupBy, recompute groupBy) over the long-form
(id, pos, val) frame, which is cached once. Empty clusters simply drop
out (both engines derive them from identical assignments, so parity
holds); production k-means++ recovery strategies are orthogonal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DEC = "decimal(38,18)"


def _dsum_exact(col_expr):
    return F.sum(col_expr.cast(_DEC)).cast("double")


def long_form(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "e") -> DataFrame:
    """(id, pos, val) rows, pos 1-based to match SQL ``unnest`` replays."""
    return emb.select(id_col, F.posexplode(vec_col).alias("pos0", "val")).select(
        id_col, (F.col("pos0") + 1).alias("pos"), "val"
    )


def kmeans_assignments(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "e",
) -> DataFrame:
    """Return (id, cluster) after ``iters`` Lloyd assignment steps.

    ``iters`` assignments with ``iters - 1`` centroid recomputes in
    between (the final assignment is the output — recomputing after it
    would be wasted work).
    """
    pv = long_form(emb, id_col, vec_col).cache()

    seeds = emb.select(F.col(id_col).alias("cid")).orderBy("cid").limit(k)
    cent = (
        pv.join(F.broadcast(seeds), pv[id_col] == seeds["cid"])
        .select("cid", "pos", F.col("val").alias("cval"))
    )

    best = None
    for it in range(iters):
        d2 = (F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))
        dist = (
            pv.join(F.broadcast(cent), "pos")
            .groupBy(id_col, "cid")
            .agg(_dsum_exact(d2).alias("d2"))
        )
        w = Window.partitionBy(id_col).orderBy(F.col("d2").asc(), F.col("cid").asc())
        best = (
            dist.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(id_col, "cid")
        )
        if it < iters - 1:
            cent = (
                pv.join(best, id_col)
                .groupBy("cid", "pos")
                .agg((_dsum_exact(F.col("val")) / F.count("val")).alias("cval"))
            )
    return best.select(F.col(id_col), F.col("cid").alias("cluster"))


def kmeans_oracle_sql(k: int = 8, iters: int = 3, table: str = "embeddings") -> str:
    """Generated DuckDB replay of the exact same Lloyd path (shared
    constants, unrolled iterations) — the two engines cannot drift."""
    parts = [
        f"""WITH v AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {table}
), pv AS (
    SELECT vec_id,
           unnest(generate_series(1, len(e))) AS pos,
           unnest(e) AS val
    FROM v
), seeds AS (
    SELECT vec_id AS cid FROM v ORDER BY vec_id LIMIT {k}
), c0 AS (
    SELECT s.cid, p.pos, p.val AS cval
    FROM pv p JOIN seeds s ON p.vec_id = s.cid
)"""
    ]
    for it in range(1, iters + 1):
        prev_c = f"c{it - 1}"
        parts.append(
            f""", a{it}d AS (
    SELECT p.vec_id, c.cid,
           CAST(SUM(CAST((p.val - c.cval) * (p.val - c.cval) AS DECIMAL(38,18))) AS DOUBLE) AS d2
    FROM pv p JOIN {prev_c} c ON c.pos = p.pos
    GROUP BY p.vec_id, c.cid
), a{it} AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rn
        FROM a{it}d
    ) WHERE rn = 1
)"""
        )
        if it < iters:
            parts.append(
                f""", c{it} AS (
    SELECT a.cid, p.pos,
           CAST(SUM(CAST(p.val AS DECIMAL(38,18))) AS DOUBLE) / COUNT(p.val) AS cval
    FROM pv p JOIN a{it} a ON a.vec_id = p.vec_id
    GROUP BY a.cid, p.pos
)"""
            )
    return "".join(parts), f"a{iters}"
