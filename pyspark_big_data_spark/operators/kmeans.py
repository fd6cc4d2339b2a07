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
    n_probe: int = 1,
) -> DataFrame:
    """Return (id, cluster) after ``iters`` Lloyd assignment steps.

    ``iters`` assignments with ``iters - 1`` centroid recomputes in
    between (the final assignment is the output — recomputing after it
    would be wasted work).

    ``n_probe > 1`` makes the FINAL assignment soft: each point is
    emitted for its ``n_probe`` nearest centroids (one row per cell),
    while the intermediate centroid recomputes stay hard (rn == 1, the
    classic Lloyd update). This is the multi-probe trick that recovers
    the cross-cluster recall SemDeDup loses by construction — a pair
    only needs ONE shared cell among each side's n_probe cells to be
    compared — at a pair bill still bounded by Σ cell_size², never n².
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
        ranked = dist.withColumn("rn", F.row_number().over(w))
        final_n = n_probe if it == iters - 1 else 1
        best = ranked.filter(F.col("rn") <= final_n).select(id_col, "cid")
        if it < iters - 1:
            cent = (
                pv.join(best, id_col)
                .groupBy("cid", "pos")
                .agg((_dsum_exact(F.col("val")) / F.count("val")).alias("cval"))
            )
    return best.select(F.col(id_col), F.col("cid").alias("cluster"))


def kmeans_oracle_sql(
    k: int = 8, iters: int = 3, table: str = "embeddings", final_topn: int = 1
) -> tuple[str, str]:
    """Generated DuckDB replay of the exact same Lloyd path (shared
    constants, unrolled iterations) — the two engines cannot drift.
    ``final_topn`` mirrors ``kmeans_assignments(n_probe=...)``: the last
    assignment CTE keeps the top-n cells per point instead of the argmin.

    Returns ``(sql_chain, final_cte_name)``: the WITH-chain text and the
    name of the final assignment CTE a caller should SELECT from."""
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
        topn = final_topn if it == iters else 1
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
    ) WHERE rn <= {topn}
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


def kmeans_assignments_np(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "e",
    n_probe: int = 1,
) -> DataFrame:
    """BLAS fast tier of ``kmeans_assignments``: same smallest-id init,
    same Lloyd schedule, but each assignment pass is a mapInPandas argmin
    against the BROADCAST centroid matrix — zero shuffle for assignment
    (the corpus is scanned in place), one small aggregate + driver
    collect (k x dim doubles) per recompute.

    Double-vs-decimal distance sums can flip near-tied argmins, so this
    tier is agreement-gated against the exact tier in tests rather than
    oracled. At 100 TB this is the production shape: the corpus never
    shuffles, centroids ride the broadcast, and the per-iteration driver
    round-trip is k x dim floats.
    """
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    seed_rows = emb.orderBy(id_col).limit(k).collect()
    cids = np.array([r[id_col] for r in seed_rows], dtype="int64")  # ascending
    cmat = np.stack([np.asarray(r[vec_col], dtype="float64") for r in seed_rows])

    assign_df = None
    for it in range(iters):
        b = spark.sparkContext.broadcast((cids, cmat))

        final_n = n_probe if it == iters - 1 else 1

        # bind the broadcast by VALUE: `b` rebinds every loop iteration,
        # and the returned frame's closure must not chase the name
        def assign(batches, _b=b, _n=final_n):
            ids_c, m = _b.value

            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf[vec_col].to_numpy())
                d2 = ((x[:, None, :] - m[None, :, :]) ** 2).sum(axis=2)
                if _n == 1:
                    # argmin takes the FIRST min index; ids_c ascending
                    # makes this the same (d2, cid) tie-break as the
                    # exact tier
                    best = np.argmin(d2, axis=1)
                    yield pd.DataFrame(
                        {
                            id_col: pdf[id_col].astype("int64"),
                            "cluster": ids_c[best],
                        }
                    )
                else:
                    # soft final assignment: top-n cells per point
                    # (stable sort == (d2, cid) tie-break, ids ascending)
                    nn = min(_n, d2.shape[1])
                    top = np.argsort(d2, axis=1, kind="stable")[:, :nn]
                    ids = pdf[id_col].to_numpy().astype("int64")
                    yield pd.DataFrame(
                        {
                            id_col: np.repeat(ids, nn),
                            "cluster": ids_c[top].ravel(),
                        }
                    )

        assign_df = emb.mapInPandas(assign, schema=f"{id_col} long, cluster long")
        if it < iters - 1:
            cent_rows = (
                emb.join(assign_df, id_col)
                .select("cluster", F.posexplode(vec_col).alias("pos0", "val"))
                .groupBy("cluster", "pos0")
                .agg(F.avg("val").alias("cval"))
                .collect()
            )
            live = sorted({r["cluster"] for r in cent_rows})
            dim = max(r["pos0"] for r in cent_rows) + 1
            cids = np.array(live, dtype="int64")
            idx = {c: i for i, c in enumerate(live)}
            cmat = np.zeros((len(live), dim))
            for r in cent_rows:
                cmat[idx[r["cluster"]], r["pos0"]] = r["cval"]
    return assign_df
