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
a shuffle-free phase-1 pre-cut (mapInPandas quadratic-form distances
against the broadcast centroid matrix, emitting ~final_n candidate
cells per point) followed by a decimal-exact phase-2 re-rank over the
candidates only — the shuffled row count is O(n · final_n), never
O(n · k), so the k ∝ n cell schedule (queries/clustering.py::_k_for)
cannot blow the exchange. Empty clusters simply drop out (both engines
derive them from identical assignments, so parity holds); production
k-means++ recovery strategies are orthogonal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DEC = "decimal(38,18)"

# Two-phase argmin margin: the double-precision prefilter keeps every
# centroid whose d2 is within _TIE_EPS of the running top-n cutoff, and
# only those are re-summed decimal-exact. Double partial-aggregation
# error for a 64-term sum of O(100)-magnitude squares is ~1e-12
# absolute, four orders under this margin, so the decimal top-n is
# always inside the prefiltered candidate set and the final assignment
# is bit-identical to the all-decimal path (which the DuckDB oracle
# parity tests pin).
_TIE_EPS = 1e-6


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
    spark = emb.sparkSession
    pv = long_form(emb, id_col, vec_col).cache()
    ev = emb.select(id_col, vec_col)

    def _land(cent_frame: DataFrame):
        """Materialize the k×dim centroids on the driver (the same
        bounded round-trip the BLAS tier makes each iteration) and
        rebuild them as a LOCAL long-form relation for phase 2, plus
        the (cids, matrix) pair the phase-1 pre-cut broadcasts. Python
        floats are IEEE doubles, so the round-trip is bit-exact; without
        it each iteration's plan re-expands the previous iterations'
        lineage once per centroid reference (~3^iters recomputes)."""
        import numpy as np

        rows = cent_frame.collect()
        local = spark.createDataFrame(rows, cent_frame.schema)
        byc: dict = {}
        for r in rows:
            byc.setdefault(r["cid"], {})[r["pos"]] = r["cval"]
        cids = np.array(sorted(byc), dtype="int64")
        dims = sorted(next(iter(byc.values()))) if byc else []
        cmat = np.array([[byc[c][p] for p in dims] for c in cids], dtype="float64")
        return local, cids, cmat

    seeds = emb.select(F.col(id_col).alias("cid")).orderBy("cid").limit(k)
    cent, cids, cmat = _land(
        pv.join(F.broadcast(seeds), pv[id_col] == seeds["cid"]).select(
            "cid", "pos", F.col("val").alias("cval")
        )
    )

    best = None
    for it in range(iters):
        final_n = n_probe if it == iters - 1 else 1
        d2 = (F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))
        # Phase 1 — the PRE-CUT: one Arrow mapInPandas pass over the
        # corpus against the broadcast (k x dim) centroid matrix, each
        # batch a (batch x k) quadratic-form distance, emitting only the
        # (id, cid) candidates within _TIE_EPS of the per-point top-n
        # cutoff. ZERO shuffle and no n×k row materialization — the
        # previous spelling (broadcast fan-out join + two rank windows
        # over n×k rows) exchanged 12M rows per iteration at native sf3
        # under the k ∝ n schedule and dominated the oracled tier's
        # wall time (measured: see PERFORMANCE.md round-6 table).
        # Superset-exactness: phase-1 float error (quadratic form,
        # ~1e-13 absolute at these magnitudes) is three orders under
        # the _TIE_EPS margin, so the true decimal top-n always
        # survives into phase 2, which alone decides.
        cand, cand_b = _phase1_candidates(ev, id_col, vec_col, cids, cmat, final_n)
        # Phase 2 (candidates only — ~final_n per vec): decimal-exact
        # re-sum, then the decisive (d2, cid) ranking. Bit-identical to
        # ranking the full decimal matrix because the true decimal
        # top-n always survives phase 1's margin.
        dist = (
            pv.join(cand, id_col)
            .join(F.broadcast(cent), ["pos", "cid"])
            .groupBy(id_col, "cid")
            .agg(_dsum_exact(d2).alias("d2"))
        )
        w = Window.partitionBy(id_col).orderBy(F.col("d2").asc(), F.col("cid").asc())
        ranked = dist.withColumn("rn", F.row_number().over(w))
        best = ranked.filter(F.col("rn") <= final_n).select(id_col, "cid")
        if it < iters - 1:
            cent, cids, cmat = _land(
                pv.join(best, id_col)
                .groupBy("cid", "pos")
                .agg((_dsum_exact(F.col("val")) / F.count("val")).alias("cval"))
            )
            # The _land collect above materialized every plan that read
            # this iteration's centroid broadcast — drop the executor
            # copies so long-lived sessions (bench, test runners) don't
            # accumulate one dangling broadcast per Lloyd iteration.
            # unpersist (not destroy): a re-execution of the lazy plan
            # would transparently re-ship it from the driver. The final
            # iteration's broadcast stays alive — ``best`` is returned
            # lazily and the caller materializes it.
            cand_b.unpersist()
    return best.select(F.col(id_col), F.col("cid").alias("cluster"))


def _phase1_candidates(
    ev: DataFrame, id_col: str, vec_col: str, cids, cmat, final_n: int
):
    """The phase-1 pre-cut: (id, cid) candidate pairs whose plain-double
    distance is within _TIE_EPS of the point's top-``final_n`` cutoff.

    One mapInPandas scan, centroids on the broadcast: per Arrow batch
    the distance matrix is the (batch x k) quadratic form
    ``|x|^2 + |c|^2 - 2 x·c`` (never the (batch x k x dim) diff tensor —
    at k=200 that would be ~1 GB per 10k-row batch), the cutoff is a
    per-row ``np.partition``, and only rows inside the margin are
    emitted (~final_n per point). The decimal-exact phase 2 re-sums and
    ranks ONLY these candidates, so engine-level exactness is decided
    there — this pass only needs the superset property, which the
    _TIE_EPS margin guarantees against both codegen-fold and BLAS
    summation error (see the margin note above)."""
    import numpy as np
    import pandas as pd

    b = ev.sparkSession.sparkContext.broadcast((cids, cmat))

    def scan(batches, _n=final_n):
        ids_c, m = b.value
        m2 = (m * m).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            d2 = (x * x).sum(axis=1)[:, None] + m2[None, :] - 2.0 * (x @ m.T)
            kk = min(_n, d2.shape[1])
            cut = np.partition(d2, kk - 1, axis=1)[:, kk - 1]
            rows, cols = np.nonzero(d2 <= (cut[:, None] + _TIE_EPS))
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame({id_col: ids[rows], "cid": ids_c[cols]})

    return ev.mapInPandas(scan, schema=f"{id_col} long, cid long"), b


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
