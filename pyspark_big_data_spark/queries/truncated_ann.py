"""Truncated-dimension (Matryoshka-style) ANN with exact rescoring.

The second classic index-shrinking lever next to int8 quantization
(queries/quantization.py): store/scan only a PREFIX of each embedding
for candidate generation — a {1/_TRUNC_FRAC} prefix moves
{1/_TRUNC_FRAC} of the bytes and does {1/_TRUNC_FRAC} of the multiplies
— then rescore a small pool with the full-precision vectors.
Matryoshka-trained embeddings concentrate information in the leading
dimensions, making the prefix a usable coarse score; on the synthetic
embeddings here the prefix is just a random projection, which is
exactly the honest recall baseline (measured in tests: pool recall vs
the exact tier).

Differential-oracle exactness: the coarse score divides a fixed-order
sequential-fold dot (functions/vectors.py::dot_flat == DuckDB
list_dot_product, bit-identical) by guarded truncated norms spelled the
same on both sides — so coarse RANKS are bit-exact; the rescore stage
reuses the exact tier's convention (sequential-fold full-dim cosine,
raw-value ranking with id tie-break, 6dp rounding only for the emitted
value). No float-drift caveats anywhere.

Scale notes: candidate stage is corpus x broadcast(probes) over
{_TRUNC_DIM} flat codegen columns (a quarter of the quantized tier's
already-1-byte-per-dim traffic is the point at 100 TB: the prefix
index fits hotter cache tiers); the rescore pool is POOL*k rows per
probe against broadcast full-precision sides. No stage shuffles vector
payloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.functions import vectors as V
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_DIM = 64  # embeddings-table dimension (asserted at runtime)
_TRUNC_FRAC = 2
_TRUNC_DIM = _DIM // _TRUNC_FRAC  # 32-dim prefix for the coarse stage
_PROBE_MOD = 50  # same probe sample as the other ANN tiers
_TOP_K = 5
_POOL = 6  # rescore pool: top POOL*k coarse candidates per probe

# Measured pool recall vs the exact top-k (sf0.01, RANDOM embeddings —
# the adversarial case; Matryoshka-trained embeddings front-load
# information and sit far above this):
#   prefix 16: pool 3x -> 0.32   6x -> 0.54   10x -> 0.66
#   prefix 32: pool 3x -> 0.64   6x -> 0.82   10x -> 0.88
#   prefix 48: pool 3x -> 0.84   6x -> 0.94   10x -> 0.96
# Registered default = prefix 32 / pool 6x: half the candidate-stage
# bytes and multiplies for 0.82 worst-case recall. The floor pinned in
# tests/test_truncated_ann.py tracks this table.


def _guarded(norm: Column) -> Column:
    """Zero-norm guard (all-zero prefix): both engines spell the same
    CASE, so the degenerate cosine is 0-valued rather than engine-
    dependent NaN/inf ordering."""
    return F.when(norm == 0.0, F.lit(1.0)).otherwise(norm)


_TANN_ORACLE = f"""
WITH v AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), tv AS (
    SELECT vec_id, e,
           e[1:{_TRUNC_DIM}] AS t,
           CASE WHEN sqrt(list_dot_product(e[1:{_TRUNC_DIM}], e[1:{_TRUNC_DIM}])) = 0.0
                THEN 1.0
                ELSE sqrt(list_dot_product(e[1:{_TRUNC_DIM}], e[1:{_TRUNC_DIM}]))
           END AS tn,
           sqrt(list_dot_product(e, e)) AS nn
    FROM v
), pool AS (
    SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_dot_product(a.t, b.t) / (a.tn * b.tn) DESC,
                        b.vec_id ASC
           ) AS pool_rnk
    FROM (SELECT * FROM tv WHERE vec_id % {_PROBE_MOD} = 0) a
    JOIN tv b ON b.vec_id <> a.vec_id
), rescored AS (
    SELECT p.probe_id, p.neighbor_id,
           list_dot_product(a.e, b.e) / (a.nn * b.nn) AS cos
    FROM pool p
    JOIN tv a ON a.vec_id = p.probe_id
    JOIN tv b ON b.vec_id = p.neighbor_id
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


def truncated_pool(emb: DataFrame, trunc_dim: int = _TRUNC_DIM) -> DataFrame:
    """(probe_id, neighbor_id): the coarse candidate pool ranked by
    prefix-cosine — corpus x broadcast(probes) over ``trunc_dim`` flat
    codegen columns only."""
    # compact HOF expression for the per-row norm (a trunc_dim-term
    # unrolled tree here makes Catalyst's constraint canonicalization
    # blow up through the downstream join); the sequential fold keeps
    # it bit-identical to DuckDB's list_dot_product on the same slice.
    t = F.slice(F.col("e"), 1, trunc_dim)
    tnorm = _guarded(F.sqrt(V.dot(t, t)))
    base = emb.select("vec_id", "e", tnorm.alias("tn"))
    corpus = V.flatten_vec(
        base.select(
            F.col("vec_id").alias("neighbor_id"), "e", F.col("tn").alias("t_nb")
        ),
        "e", trunc_dim, "_b", ["neighbor_id", "t_nb"],
    )
    probes = V.flatten_vec(
        base.filter(F.col("vec_id") % _PROBE_MOD == 0).select(
            F.col("vec_id").alias("probe_id"), "e", F.col("tn").alias("t_na")
        ),
        "e", trunc_dim, "_a", ["probe_id", "t_na"],
    )
    coarse = V.dot_flat("_a", "_b", trunc_dim) / (F.col("t_na") * F.col("t_nb"))
    w_pool = Window.partitionBy("probe_id").orderBy(
        F.col("coarse").desc(), F.col("neighbor_id").asc()
    )
    return (
        corpus.join(F.broadcast(probes), F.col("neighbor_id") != F.col("probe_id"))
        .withColumn("coarse", coarse)
        .select("probe_id", "neighbor_id", "coarse")
        .withColumn("pool_rnk", F.row_number().over(w_pool))
        .filter(F.col("pool_rnk") <= _POOL * _TOP_K)
        .select("probe_id", "neighbor_id")
    )


@register("ann_topk_truncated", oracle=_TANN_ORACLE, driver=False)
def ann_topk_truncated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage truncated-dim ANN: rank ALL candidates per probe by
    {_TRUNC_DIM}-dim prefix cosine, keep the top {_POOL}*k pool,
    rescore ONLY the pool with full-precision cosine, emit the exact
    top-k of the pool. Same recipe (and output contract) as
    ann_topk_quantized with the prefix replacing int8."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    dim_row = emb.select(F.size("e").alias("d")).first()
    dim = dim_row["d"] if dim_row else _DIM

    pool = truncated_pool(emb, _TRUNC_DIM)

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


@register("ann_topk_truncated_np", driver=False)
def ann_topk_truncated_np(
    spark: SparkSession, sf_dir: str, probe_shards: int | None = None
) -> DataFrame:
    """BLAS twin of ann_topk_truncated: slice the prefix before the
    GEMM, per-batch top-pool, exact global pool window, full-precision
    rescore — the scale path for prefix search (the oracled tier's
    codegen BNL is the differential witness; measured 224.9 s at native
    sf3 vs seconds here). Same pool-boundary-ulps caveat as the other
    BLAS tiers: agreement-gated in tests/test_truncated_ann.py."""
    import numpy as np
    import pandas as pd

    from pyspark_big_data_spark.queries.similarity import _probe_shards, guard_allpairs

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    dim_row = emb.select(F.size("e").alias("d")).first()
    dim = dim_row["d"] if dim_row else _DIM
    td = _TRUNC_DIM
    pool_n = _POOL * _TOP_K

    probes_pd = guard_allpairs(
        emb.filter(F.col("vec_id") % _PROBE_MOD == 0), "ann_topk_truncated_np probes"
    ).toPandas()
    pids_all = probes_pd["vec_id"].to_numpy()
    pmat_all = np.stack(probes_pd["e"].to_numpy())

    def _prefix_unit(x):
        t = x[:, :td]
        nrm = np.linalg.norm(t, axis=1)
        nrm = np.where(nrm == 0.0, 1.0, nrm)
        return t / nrm[:, None]

    pu_all = _prefix_unit(pmat_all)

    def shard_scan(pids, pu) -> DataFrame:
        b = spark.sparkContext.broadcast((pids, pu))

        def scan(batches):
            s_pids, s_pu = b.value
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf["e"].to_numpy())
                coarse = _prefix_unit(x) @ s_pu.T
                ids = pdf["vec_id"].to_numpy()
                coarse[ids[:, None] == s_pids[None, :]] = -np.inf
                kk = min(pool_n, coarse.shape[0])
                top = np.argpartition(-coarse, kk - 1, axis=0)[:kk]
                sc = np.take_along_axis(coarse, top, axis=0)
                keep = np.isfinite(sc).ravel(order="F")
                yield pd.DataFrame(
                    {
                        "probe_id": np.repeat(s_pids, kk)[keep],
                        "neighbor_id": ids[top].ravel(order="F")[keep],
                        "coarse": sc.ravel(order="F")[keep],
                    }
                )

        return emb.mapInPandas(scan, schema="probe_id long, neighbor_id long, coarse double")

    cand = None
    for s_pids, _ in _probe_shards(pids_all, pmat_all, probe_shards):
        mask = np.isin(pids_all, s_pids)
        shard = shard_scan(pids_all[mask], pu_all[mask])
        cand = shard if cand is None else cand.unionByName(shard)

    w_pool = Window.partitionBy("probe_id").orderBy(
        F.col("coarse").desc(), F.col("neighbor_id").asc()
    )
    pool = (
        cand.withColumn("pool_rnk", F.row_number().over(w_pool))
        .filter(F.col("pool_rnk") <= pool_n)
        .select("probe_id", "neighbor_id")
    )
    from pyspark_big_data_spark.queries.quantization import rescore_pool

    return rescore_pool(pool, emb, dim)
