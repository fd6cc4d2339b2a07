"""Int8 embedding quantization + quantized ANN with exact rescoring.

The production memory/IO lever for a 100 TB vector corpus: symmetric
per-vector absmax quantization stores each dimension in 1 byte instead
of 8 (the index shrinks 8x, scans move 8x less data), candidate ranking
runs on integer dot products, and only a small rescore pool per probe
ever touches the full-precision vectors.

Why this oracles EXACTLY (no float-order caveats anywhere):
- the quantized values are integers produced by a deterministic
  expression (floor(x/scale + 0.5)) evaluated identically by Spark and
  DuckDB on identical doubles;
- integer dot products of int8 values (|q| <= 127, dim 64) are exact in
  a double accumulator regardless of summation order — the one kind of
  "sum" that cannot drift between engines;
- the approximate score dequantizes with one multiplication chain whose
  order both sides spell identically.

Scale notes: the candidate stage is ONE Arrow mapInPandas pass over
the quantized corpus against the bounded broadcast probe set (exact
int8 integer GEMM per batch + a margin pre-cut; phase 2's exact
Spark-side integer-dot ranking decides — the pq.py/kmeans.py phase-1
pattern); the rescore pool is POOL x k rows per probe, attached to
full-precision vectors from a broadcast side. No stage shuffles
vector payloads, and no n x |probes| row set is ever sorted whole.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.functions import vectors as V
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_Q = 127  # int8 symmetric range
# Phase-1 pre-cut margin on the dequantized approx score (|approx|<=~1):
# numpy's elementwise dequantize chain can differ from Spark's by <~1e-15;
# 1e-9 is six orders of safety, phase 2's exact ranking decides.
_Q_EPS = 1e-9
_PROBE_MOD = 50  # same probe sample as the other ANN tiers
_TOP_K = 5
_POOL = 3  # rescore pool: top POOL*k quantized candidates per probe


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )


def _scale(e: Column) -> Column:
    """Per-vector absmax scale; all-zero vectors quantize to zeros via
    the scale-1 guard (both engines spell the same CASE)."""
    amax = F.array_max(F.transform(e, lambda x: F.abs(x)))
    return F.when(amax == 0.0, F.lit(1.0)).otherwise(amax / F.lit(float(_Q)))


def quantized_vectors(emb: DataFrame) -> DataFrame:
    """(vec_id, scale, q array<int>): symmetric int8 quantization.

    floor(x/scale + 0.5) is half-up rounding spelled so Spark and
    DuckDB agree exactly (ROUND half-even vs half-away differs between
    engines; floor(+0.5) does not)."""
    q = F.transform(
        "e", lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("int")
    )
    return emb.withColumn("scale", _scale(F.col("e"))).select(
        "vec_id", "scale", q.alias("q")
    )


_DD_QUANT_CTE = f"""
v AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), sc AS (
    SELECT vec_id, e,
           CASE WHEN list_max(list_transform(e, x -> abs(x))) = 0.0 THEN 1.0
                ELSE list_max(list_transform(e, x -> abs(x))) / {float(_Q)!r}
           END AS scale
    FROM v
), qv AS (
    SELECT vec_id, e, scale,
           list_transform(e, x -> CAST(floor(x / scale + 0.5) AS INT)) AS q
    FROM sc
)"""

_QUANTIZE_ORACLE = f"""
WITH {_DD_QUANT_CTE}
SELECT vec_id,
       ROUND(scale, 9) AS scale9,
       CAST(len(q) AS BIGINT) AS dim,
       CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS l1,
       md5(array_to_string(q, ',')) AS vec_md5
FROM qv ORDER BY vec_id
"""


@register("embedding_quantize_int8", oracle=_QUANTIZE_ORACLE)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization of every embedding, emitted as the scalar
    digest view (dim, L1 mass, md5 of the comma-joined ints — any
    element change flips vec_md5) plus the rounded scale; pipelines
    consume the raw ints via quantized_vectors directly. Same digest
    convention as doc_embed_hash."""
    qv = quantized_vectors(_emb(spark, sf_dir))
    return qv.select(
        "vec_id",
        F.round("scale", 9).alias("scale9"),
        F.size("q").cast("long").alias("dim"),
        F.aggregate("q", F.lit(0).cast("long"), lambda a, x: a + F.abs(x)).alias("l1"),
        F.md5(F.concat_ws(",", F.transform("q", lambda x: x.cast("string")))).alias(
            "vec_md5"
        ),
    ).orderBy("vec_id")


_QANN_ORACLE = f"""
WITH {_DD_QUANT_CTE},
nrm AS (
    SELECT vec_id, sqrt(list_dot_product(e, e)) AS nn FROM v
), pool AS (
    SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
           CAST(list_dot_product(a.q, b.q) AS DOUBLE) * a.scale * b.scale
               / (na.nn * nb.nn) AS approx,
           ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY CAST(list_dot_product(a.q, b.q) AS DOUBLE) * a.scale * b.scale
                            / (na.nn * nb.nn) DESC,
                        b.vec_id ASC
           ) AS pool_rnk
    FROM (SELECT * FROM qv WHERE vec_id % {_PROBE_MOD} = 0) a
    JOIN qv b ON b.vec_id <> a.vec_id
    JOIN nrm na ON na.vec_id = a.vec_id
    JOIN nrm nb ON nb.vec_id = b.vec_id
), rescored AS (
    SELECT p.probe_id, p.neighbor_id,
           list_dot_product(a.e, b.e) / (na.nn * nb.nn) AS cos
    FROM pool p
    JOIN v a ON a.vec_id = p.probe_id
    JOIN v b ON b.vec_id = p.neighbor_id
    JOIN nrm na ON na.vec_id = p.probe_id
    JOIN nrm nb ON nb.vec_id = p.neighbor_id
    WHERE p.pool_rnk <= {_POOL * _TOP_K}
)
SELECT probe_id, neighbor_id, ROUND(cos, 6) AS cosine,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC
       ) AS BIGINT) AS rnk
FROM rescored
QUALIFY rnk <= {_TOP_K}
ORDER BY probe_id, rnk
"""


@register("ann_topk_quantized", oracle=_QANN_ORACLE)
def ann_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage quantized ANN: rank ALL candidates per probe by the
    dequantized int8 score (integer dot — exact, order-independent —
    times the two scales, over the true norms), keep the top
    {_POOL}*k pool, rescore ONLY the pool with full-precision cosine,
    emit the exact top-k of the pool.

    This is the classic quantized-index recipe (store int8, rescore
    fp): the full-precision vectors are touched for {_POOL}*k rows per
    probe instead of the whole corpus. Ranking and rescoring are both
    deterministic in both engines, so the oracle is exact — no
    agreement gate needed, unlike the BLAS tiers."""
    import numpy as np
    import pandas as pd

    emb = _emb(spark, sf_dir)
    dim_row = emb.select(F.size("e").alias("d")).first()
    dim = dim_row["d"] if dim_row else 0
    # pinned: the probe collect, the phase-1 scan input, and BOTH sides
    # of the phase-2 pool join consume qv — unpinned, the corpus-wide
    # quantization transforms re-run four times. An EAGER localCheckpoint
    # rather than persist (r14 advice item): the returned frame is lazy,
    # so an in-function unpersist is impossible — checkpoint blocks are
    # reclaimed by the ContextCleaner once the result frame is dropped,
    # where a persist would pin a corpus-sized frame per invocation for
    # the session's lifetime.
    qv = quantized_vectors(emb).join(
        emb.select("vec_id", V.norm(F.col("e")).alias("nn")), "vec_id"
    ).localCheckpoint(eager=True)

    # Phase 1 — the PRE-CUT (the pq.py / kmeans.py pattern): one Arrow
    # mapInPandas pass over (vec_id, q, scale, nn) against the bounded
    # broadcast probe set, per batch an exact integer int8 GEMM + the
    # dequantize chain in double, emitting only pairs within _Q_EPS of
    # each probe's per-batch top-(POOL*k) cutoff. The global exact pool
    # is contained in the union of per-batch pools; phase 2's exact
    # Spark-side integer-dot ranking decides, so the oracle is
    # unchanged. (The previous single-phase flat-column join paid a
    # 64-term codegen dot AND a full per-probe sort over n x |probes|
    # rows — 37 s at native sf1 for ~4 s of arithmetic.)
    pool_n = _POOL * _TOP_K
    prows = qv.filter(F.col("vec_id") % _PROBE_MOD == 0).collect()
    pids = np.array(sorted(int(r["vec_id"]) for r in prows), dtype="int64")
    order = {int(r["vec_id"]): r for r in prows}
    pq_mat = np.array([order[int(p)]["q"] for p in pids], dtype="int64")
    p_scale = np.array([order[int(p)]["scale"] for p in pids], dtype="float64")
    p_nrm = np.array([order[int(p)]["nn"] for p in pids], dtype="float64")
    b = spark.sparkContext.broadcast((pids, pq_mat, p_scale, p_nrm))

    def scan(batches, _n=pool_n):
        pid_arr, pm, ps, pn = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            vids = pdf["vec_id"].to_numpy()
            qm = np.stack(pdf["q"].to_numpy()).astype("int64")
            ns = pdf["scale"].to_numpy()
            nnrm = pdf["nn"].to_numpy()
            qd = pm @ qm.T  # exact integer dots, (P, B)
            approx = (
                qd.astype("float64")
                * ps[:, None]
                * ns[None, :]
                / (pn[:, None] * nnrm[None, :])
            )
            approx[pid_arr[:, None] == vids[None, :]] = -np.inf  # self
            kk = min(_n, approx.shape[1])
            cut = -np.partition(-approx, kk - 1, axis=1)[:, kk - 1]
            rows, cols = np.nonzero(approx >= (cut[:, None] - _Q_EPS))
            yield pd.DataFrame(
                {"probe_id": pid_arr[rows], "neighbor_id": vids[cols]}
            )

    par = spark.sparkContext.defaultParallelism
    cand = (
        qv.select("vec_id", "q", "scale", "nn")
        .repartition(par, "vec_id")
        .mapInPandas(scan, schema="probe_id long, neighbor_id long")
    )

    # Phase 2 — exact: recompute approx for candidates only with the
    # HOF integer dot (exact in a double accumulator regardless of
    # order) and the identical dequantize spelling, then the decisive
    # (approx desc, neighbor_id) ranking.
    pa = qv.filter(F.col("vec_id") % _PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("q").alias("_pq"),
        F.col("scale").alias("p_scale"),
        F.col("nn").alias("p_nrm"),
    )
    nb = qv.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("_nq"),
        F.col("scale").alias("n_scale"),
        F.col("nn").alias("n_nrm"),
    )
    qdot = F.aggregate(
        F.zip_with("_pq", "_nq", lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    approx = (
        qdot.cast("double")
        * F.col("p_scale")
        * F.col("n_scale")
        / (F.col("p_nrm") * F.col("n_nrm"))
    )
    w_pool = Window.partitionBy("probe_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id").asc()
    )
    pool = (
        cand.join(F.broadcast(pa), "probe_id")
        .join(nb, "neighbor_id")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .withColumn("approx", approx)
        .select("probe_id", "neighbor_id", "approx")
        .withColumn("pool_rnk", F.row_number().over(w_pool))
        .filter(F.col("pool_rnk") <= pool_n)
        .select("probe_id", "neighbor_id")
    )

    return rescore_pool(pool, emb, dim)


def rescore_pool(pool: DataFrame, emb: DataFrame, dim: int) -> DataFrame:
    """Full-precision rescore of a (probe_id, neighbor_id) candidate
    pool from broadcast flat sides — shared by the oracled int8 tier
    and its BLAS twin so the rescore semantics cannot drift."""
    fa = V.flatten_vec(
        emb.select(F.col("vec_id").alias("probe_id"), "e", V.norm(F.col("e")).alias("pa")),
        "e", dim, "_a", ["probe_id", "pa"],
    )
    fb = V.flatten_vec(
        emb.select(F.col("vec_id").alias("neighbor_id"), "e", V.norm(F.col("e")).alias("pb")),
        "e", dim, "_b", ["neighbor_id", "pb"],
    )
    cos = V.dot_flat("_a", "_b", dim) / (F.col("pa") * F.col("pb"))
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        pool.join(F.broadcast(fa), "probe_id")
        .join(F.broadcast(fb), "neighbor_id")
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _TOP_K)
        .select("probe_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rnk")
        .orderBy("probe_id", "rnk")
    )


@register("ann_topk_quantized_np", driver=False)
def ann_topk_quantized_np(
    spark: SparkSession, sf_dir: str, probe_shards: int | None = None
) -> DataFrame:
    """BLAS twin of ann_topk_quantized: the int8 GEMM production path.

    Same recipe — int8-quantize, rank all candidates per probe by the
    dequantized integer dot, rescore the top {_POOL}*k pool at full
    precision — but the candidate stage is an Arrow mapInPandas pass
    doing an int32 GEMM per batch (batch_int8 @ probes_int8.T). This is
    the tier whose arithmetic matches what a 100 TB deployment actually
    runs: 1-byte-per-dim operands through integer matrix units, 8x the
    memory bandwidth of the fp64 scan, with the fp vectors touched only
    for POOL*k rows per probe. Quantization inside the pass is the SAME
    floor(x/scale + 0.5) expression as quantized_vectors, evaluated by
    numpy on the identical doubles — the int8 codes agree bit-for-bit
    with the oracled tier (asserted in tests/test_quantization.py), so
    the two tiers can only diverge on float-tied pool boundaries
    (dequantize multiply order), which the agreement gate tolerates.

    Probe sharding reuses the similarity-module policy: each shard's
    int8 probe matrix rides its own broadcast, the corpus is scanned
    per shard, and the exact global pool window runs over the tiny
    per-batch candidate union.
    """
    import numpy as np
    import pandas as pd

    from pyspark_big_data_spark.queries.similarity import _probe_shards, guard_allpairs

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    dim_row = emb.select(F.size("e").alias("d")).first()
    dim = dim_row["d"] if dim_row else 0

    def _quant(x: "np.ndarray") -> tuple["np.ndarray", "np.ndarray", "np.ndarray"]:
        """(q int8, scale, true_norm) — numpy replay of quantized_vectors."""
        amax = np.abs(x).max(axis=1)
        scale = np.where(amax == 0.0, 1.0, amax / float(_Q))
        q = np.floor(x / scale[:, None] + 0.5).astype(np.int8)
        nrm = np.linalg.norm(x, axis=1)
        return q, scale, nrm

    probes_pd = guard_allpairs(
        emb.filter(F.col("vec_id") % _PROBE_MOD == 0), "ann_topk_quantized_np probes"
    ).toPandas()
    pids_all = probes_pd["vec_id"].to_numpy()
    pmat = np.stack(probes_pd["e"].to_numpy())
    pq_all, pscale_all, pnrm_all = _quant(pmat)

    pool_n = _POOL * _TOP_K

    def shard_scan(pids, pq, pscale, pnrm) -> DataFrame:
        b = spark.sparkContext.broadcast((pids, pq, pscale, pnrm))

        def scan(batches):
            s_pids, s_pq, s_pscale, s_pnrm = b.value
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf["e"].to_numpy())
                q, scale, nrm = _quant(x)
                # int8 GEMM in int32 accumulators; exact (dim 64, |q|<=127)
                dots = q.astype(np.int32) @ s_pq.astype(np.int32).T
                approx = (
                    dots.astype(np.float64)
                    * scale[:, None]
                    * s_pscale[None, :]
                    / (nrm[:, None] * s_pnrm[None, :])
                )
                ids = pdf["vec_id"].to_numpy()
                approx[ids[:, None] == s_pids[None, :]] = -np.inf  # exclude self
                kk = min(pool_n, approx.shape[0])
                top = np.argpartition(-approx, kk - 1, axis=0)[:kk]
                sc = np.take_along_axis(approx, top, axis=0)
                keep = np.isfinite(sc).ravel(order="F")
                yield pd.DataFrame(
                    {
                        "probe_id": np.repeat(s_pids, kk)[keep],
                        "neighbor_id": ids[top].ravel(order="F")[keep],
                        "approx": sc.ravel(order="F")[keep],
                    }
                )

        return emb.mapInPandas(scan, schema="probe_id long, neighbor_id long, approx double")

    cand = None
    for lo_pids, _ in _probe_shards(pids_all, pmat, probe_shards):
        mask = np.isin(pids_all, lo_pids)
        shard = shard_scan(pids_all[mask], pq_all[mask], pscale_all[mask], pnrm_all[mask])
        cand = shard if cand is None else cand.unionByName(shard)

    w_pool = Window.partitionBy("probe_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id").asc()
    )
    pool = (
        cand.withColumn("pool_rnk", F.row_number().over(w_pool))
        .filter(F.col("pool_rnk") <= pool_n)
        .select("probe_id", "neighbor_id")
    )
    return rescore_pool(pool, emb, dim)


@register("ann_topk_ivf_quantized", driver=False)
def ann_topk_ivf_quantized(
    spark: SparkSession, sf_dir: str, probe_shards: int | None = None
) -> DataFrame:
    """IVF x int8: the two orthogonal ANN cost levers composed — cells
    cut the CANDIDATE COUNT (each probe scans its top-NPROBE cells
    only), int8 cuts the BYTES PER CANDIDATE (1/8), and the
    full-precision vectors are touched only for the {_POOL}*k rescore
    pool per probe. This is the production index layout (FAISS
    IVF+scalar-quantizer shape) expressed as one mapInPandas scan:
    per Arrow batch, per cell present in the batch, int8-quantize the
    rows (the shared floor expression) and int32-GEMM them against the
    int8 probe matrix of that cell's probes.

    Rows-only: recall-gated against the fp IVF tier over the SAME cells
    (tests/test_quantization.py) — int8 at dim 64 is near-lossless, so
    the gate is tight (>=98%).
    """
    import numpy as np
    import pandas as pd

    from pyspark_big_data_spark.queries.ann_ivf import _NPROBE
    from pyspark_big_data_spark.queries.similarity import _probe_shards, guard_allpairs

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"), "label"
    )
    dim_row = emb.select(F.size("e").alias("d")).first()
    dim = dim_row["d"] if dim_row else 0

    def _quant(x):
        amax = np.abs(x).max(axis=1)
        scale = np.where(amax == 0.0, 1.0, amax / float(_Q))
        q = np.floor(x / scale[:, None] + 0.5).astype(np.int8)
        return q, scale, np.linalg.norm(x, axis=1)

    # centroids: cells x dim is tiny — aggregate distributed, collect
    cent_rows = (
        emb.select("label", F.posexplode("e").alias("pos0", "val"))
        .groupBy("label", "pos0")
        .agg(F.avg("val").alias("cval"))
        .collect()
    )
    labels = sorted({r["label"] for r in cent_rows})
    cmat = np.zeros((len(labels), dim))
    lab_idx = {lab: i for i, lab in enumerate(labels)}
    for r in cent_rows:
        cmat[lab_idx[r["label"]], r["pos0"]] = r["cval"]
    cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

    probes_pd = guard_allpairs(
        emb.filter(F.col("vec_id") % _PROBE_MOD == 0), "ann_topk_ivf_quantized probes"
    ).toPandas()
    pids_all = probes_pd["vec_id"].to_numpy()
    pmat_all = np.stack(probes_pd["e"].to_numpy())
    pq_all, pscale_all, pnrm_all = _quant(pmat_all)
    punit = pmat_all / pnrm_all[:, None]
    pool_n = _POOL * _TOP_K

    def shard_scan(idx) -> DataFrame:
        pids, pq, pscale, pnrm = pids_all[idx], pq_all[idx], pscale_all[idx], pnrm_all[idx]
        # rank cells per probe on the fp unit vectors (tiny matmul)
        ccos = punit[idx] @ cmat.T
        order = np.argsort(-ccos, axis=1, kind="stable")[:, :_NPROBE]
        per_cell: dict = {}
        for pi, cells in enumerate(order):
            for ci in cells:
                per_cell.setdefault(labels[ci], []).append(pi)
        cell_probes = {
            lab: (pids[i], pq[i], pscale[i], pnrm[i]) for lab, i in per_cell.items()
        }
        b = spark.sparkContext.broadcast(cell_probes)

        def search(batches):
            cp = b.value
            for pdf in batches:
                if not len(pdf):
                    continue
                for lab, grp in pdf.groupby("label"):
                    if lab not in cp:
                        continue
                    s_pids, s_pq, s_pscale, s_pnrm = cp[lab]
                    x = np.stack(grp["e"].to_numpy())
                    q, scale, nrm = _quant(x)
                    dots = q.astype(np.int32) @ s_pq.astype(np.int32).T
                    approx = (
                        dots.astype(np.float64)
                        * scale[:, None]
                        * s_pscale[None, :]
                        / (nrm[:, None] * s_pnrm[None, :])
                    )
                    ids = grp["vec_id"].to_numpy()
                    approx[ids[:, None] == s_pids[None, :]] = -np.inf
                    kk = min(pool_n, approx.shape[0])
                    top = np.argpartition(-approx, kk - 1, axis=0)[:kk]
                    sc = np.take_along_axis(approx, top, axis=0)
                    keep = np.isfinite(sc).ravel(order="F")
                    yield pd.DataFrame(
                        {
                            "probe_id": np.repeat(s_pids, kk)[keep],
                            "neighbor_id": ids[top].ravel(order="F")[keep],
                            "approx": sc.ravel(order="F")[keep],
                        }
                    )

        return emb.mapInPandas(search, schema="probe_id long, neighbor_id long, approx double")

    cand = None
    for s_pids, _ in _probe_shards(pids_all, pmat_all, probe_shards):
        idx = np.isin(pids_all, s_pids)
        shard = shard_scan(idx)
        cand = shard if cand is None else cand.unionByName(shard)

    w_pool = Window.partitionBy("probe_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id").asc()
    )
    pool = (
        cand.withColumn("pool_rnk", F.row_number().over(w_pool))
        .filter(F.col("pool_rnk") <= pool_n)
        .select("probe_id", "neighbor_id")
    )
    return rescore_pool(pool, emb.select("vec_id", "e"), dim)
