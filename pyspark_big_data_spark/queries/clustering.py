"""Embedding clustering + SemDeDup-style semantic dedup.

SemDeDup (semantic dedup over embedding clusters) is the scale recipe
for meaning-level near-dup removal in training corpora: k-means the
embeddings, then compare pairs ONLY within a cluster — Σ cluster_size²
work instead of n². Both stages here are fully oracled: the k-means
oracle is *generated* from the same constants by
``operators/kmeans.py::kmeans_oracle_sql`` (unrolled Lloyd iterations,
decimal-exact distances), so Spark and DuckDB replay the identical
fixpoint path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.functions import vectors as V
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.operators import kmeans as KM
from pyspark_big_data_spark.queries.registry import register

_K = 8
_ITERS = 3
_COS_THRESHOLD = 0.4

_CHAIN, _FINAL = KM.kmeans_oracle_sql(k=_K, iters=_ITERS)

_KMEANS_ORACLE = f"""{_CHAIN}
SELECT vec_id, cid AS cluster FROM {_FINAL} ORDER BY vec_id
"""


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )


def _dim(emb: DataFrame) -> int:
    """Fixed embedding width (one-row probe) for the unrolled codegen
    cosine — bit-identical to the HOF fold, ~100x faster per pair."""
    row = emb.select(F.size("e").alias("d")).first()
    return row["d"] if row else 0


@register("kmeans_clusters", oracle=_KMEANS_ORACLE)
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means cluster assignment for every embedding (k={_K},
    {_ITERS} iterations, deterministic smallest-id init)."""
    return KM.kmeans_assignments(_emb(spark, sf_dir), k=_K, iters=_ITERS).orderBy("vec_id")


_SEMANTIC_ORACLE = f"""{_CHAIN}
SELECT x.vec_id AS id_a, y.vec_id AS id_b,
       ROUND(list_dot_product(a.e, b.e) /
             (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
FROM {_FINAL} x
JOIN {_FINAL} y ON x.cid = y.cid AND x.vec_id < y.vec_id
JOIN v a ON a.vec_id = x.vec_id
JOIN v b ON b.vec_id = y.vec_id
WHERE list_dot_product(a.e, b.e) /
      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= {_COS_THRESHOLD}
ORDER BY id_a, id_b
"""


@register("semantic_dedup", oracle=_SEMANTIC_ORACLE)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: near-dup pairs (cosine >= {_COS_THRESHOLD}) compared
    only WITHIN a k-means cluster — the candidate equi-join is on the
    cluster id, so the pair bill is Σ cluster_size², never n².

    Recall caveat by construction (true of SemDeDup itself): a pair
    split across clusters is never compared. The exact all-pairs
    witness is ``embedding_near_dup``; the oracle here replays the same
    cluster-then-compare path, so parity is exact regardless.
    """
    emb = _emb(spark, sf_dir)
    dim = _dim(emb)
    # n tiny rows; without the cache the whole Lloyd lineage runs once
    # per self-join side
    assign = KM.kmeans_assignments(emb, k=_K, iters=_ITERS).cache()
    a = assign.select(F.col("vec_id").alias("id_a"), "cluster")
    b = assign.select(F.col("vec_id").alias("id_b"), F.col("cluster").alias("cluster_b"))
    # pair ids first (narrow rows through the cluster equi-join), then
    # attach vectors from flat-column BROADCAST sides — norms computed n
    # times (not Σ cluster² times), dot at codegen speed (dot_flat)
    cand = a.join(
        b, (F.col("cluster") == F.col("cluster_b")) & (F.col("id_a") < F.col("id_b"))
    ).select("id_a", "id_b")
    ea = V.flatten_vec(
        emb.select(F.col("vec_id").alias("id_a"), "e", V.norm(F.col("e")).alias("na")),
        "e", dim, "_a", ["id_a", "na"],
    )
    eb = V.flatten_vec(
        emb.select(F.col("vec_id").alias("id_b"), "e", V.norm(F.col("e")).alias("nb")),
        "e", dim, "_b", ["id_b", "nb"],
    )
    cos = V.dot_flat("_a", "_b", dim) / (F.col("na") * F.col("nb"))
    return (
        cand.join(F.broadcast(ea), "id_a")
        .join(F.broadcast(eb), "id_b")
        .withColumn("cos", cos)
        .filter(F.col("cos") >= _COS_THRESHOLD)
        .select("id_a", "id_b", F.round("cos", 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


@register("semantic_dedup_np", driver=False)  # fast tier; agreement-gated in pytest
def semantic_dedup_np(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLAS fast tier of semantic_dedup: identical clusters (the exact
    decimal-tier Lloyd assignment is reused — it is NOT the bottleneck),
    but the within-cluster pair stage runs as one applyInPandas per
    cluster: normalize the cluster's matrix, one X @ X.T, take the upper
    triangle over the threshold. At the 10x stress SF the interpreted
    HOF pair stage is ~94 s of semantic_dedup's 137 s; this tier runs
    the identical pair set in ~33 s (one shuffle by cluster + Arrow
    transfer dominates, the matmul is negligible — PERFORMANCE.md).
    Per-cluster memory is O(size²) doubles — the same cluster-size knob
    (grow k with n) that bounds the pair bill bounds the matmul.
    """
    emb = _emb(spark, sf_dir)
    assign = KM.kmeans_assignments(emb, k=_K, iters=_ITERS)
    ann = emb.join(assign, "vec_id").select("vec_id", "e", "cluster")
    out = ann.groupBy("cluster").applyInPandas(
        _blas_pairs_in_cluster, schema="id_a long, id_b long, cosine double"
    )
    return out.orderBy("id_a", "id_b")


def _blas_pairs_in_cluster(pdf):
    """One cluster's near-dup pairs: normalize, X @ X.T, keep the upper
    triangle over the threshold (shared by the hard and multi-probe
    BLAS tiers)."""
    import numpy as np
    import pandas as pd

    n = len(pdf)
    if n < 2:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
            {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
        )
    ids = pdf["vec_id"].to_numpy()
    x = np.stack(pdf["e"].to_numpy())
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    s = x @ x.T
    iu, ju = np.triu_indices(n, k=1)
    cos = s[iu, ju]
    keep = cos >= _COS_THRESHOLD
    a, b = ids[iu[keep]], ids[ju[keep]]
    return pd.DataFrame(
        {
            "id_a": np.minimum(a, b),
            "id_b": np.maximum(a, b),
            "cosine": np.round(cos[keep], 6),
        }
    )


_N_PROBE = 3  # cells per point in the soft assignment (recall knob)
_CELL_TARGET = 300  # target rows per k-means cell in the k-schedule


def _k_for(n: int) -> int:
    """The multi-probe k-schedule: grow k with the corpus so cells stay
    ~{_CELL_TARGET} rows and the Σ cell_size² candidate bill grows
    LINEARLY with n instead of (n_probe·n)²/k. Returns _K for every
    oracle-checked SF (n ≤ {_K}·{_CELL_TARGET} = 2400 — sf0.001/0.01
    have 500 vectors, sf0.1 has 2000), so the registered k={_K} oracle
    replays the schedule's own choice wherever the driver or pytest
    compares; larger corpora (native sf1 = 20k → k=66, sf3 = 60k →
    k=200) get the k ∝ n the 100 TB bill requires. Measured: the k=8
    pin cost the oracled tier 105.9 s at native sf1 vs 15.7 s for the
    np twin (PERFORMANCE.md)."""
    return max(_K, n // _CELL_TARGET)

_MP_CHAIN, _MP_FINAL = KM.kmeans_oracle_sql(k=_K, iters=_ITERS, final_topn=_N_PROBE)

_MULTIPROBE_ORACLE = f"""{_MP_CHAIN}
, mp_pairs AS (
    SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
    FROM {_MP_FINAL} x
    JOIN {_MP_FINAL} y ON x.cid = y.cid AND x.vec_id < y.vec_id
)
SELECT p.id_a, p.id_b,
       ROUND(list_dot_product(a.e, b.e) /
             (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
FROM mp_pairs p
JOIN v a ON a.vec_id = p.id_a
JOIN v b ON b.vec_id = p.id_b
WHERE list_dot_product(a.e, b.e) /
      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= {_COS_THRESHOLD}
ORDER BY id_a, id_b
"""


@register("semantic_dedup_multiprobe", oracle=_MULTIPROBE_ORACLE, driver=False)
def semantic_dedup_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with MULTI-PROBE (soft) assignment: each embedding joins
    its {_N_PROBE} nearest cells, and a pair is compared if the two
    sides share ANY cell. This recovers the recall the hard-assignment
    tier loses to cross-cluster splits (measured 0.30-0.46 at k={_K} on
    this testdata vs ~1.0 here; recall table in PERFORMANCE.md, floor
    gated in tests/test_clustering.py) while the pair bill stays
    Σ cell_size² — the same knob (grow k with n) bounds it at 100 TB.

    Stages: soft Lloyd assignment (operators/kmeans.py, n_probe), pair
    candidates via the cell equi-join, DISTINCT (a pair sharing several
    cells is compared once), then one exact cosine per candidate.

    k follows ``_k_for(n)``: the registered oracle replays k={_K}, which
    IS the schedule's value at every oracle-checked SF; beyond that the
    cell count grows with n so the pair bill stays linear.
    """
    emb = _emb(spark, sf_dir)
    # parquet row-count only — no vector scan
    k = _k_for(read_table(spark, sf_dir, "embeddings").count())
    assign = KM.kmeans_assignments(emb, k=k, iters=_ITERS, n_probe=_N_PROBE).cache()
    a = assign.select(F.col("vec_id").alias("id_a"), "cluster")
    b = assign.select(F.col("vec_id").alias("id_b"), F.col("cluster").alias("cluster_b"))
    cand = (
        a.join(b, (F.col("cluster") == F.col("cluster_b")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b")
        .distinct()
    )
    dim = _dim(emb)
    # broadcast flat-column sides: without the hint the second attach
    # shuffles Σ cell² candidate rows CARRYING the first side's vector
    # (~1 KB/row); broadcast keeps the pair stream map-side and the
    # only wide shuffle is the (id_a, id_b) DISTINCT. n×dim×8B must fit
    # an executor — the np twin is the tier for corpora where it can't.
    ea = V.flatten_vec(
        emb.select(F.col("vec_id").alias("id_a"), "e", V.norm(F.col("e")).alias("na")),
        "e", dim, "_a", ["id_a", "na"],
    )
    eb = V.flatten_vec(
        emb.select(F.col("vec_id").alias("id_b"), "e", V.norm(F.col("e")).alias("nb")),
        "e", dim, "_b", ["id_b", "nb"],
    )
    cos = V.dot_flat("_a", "_b", dim) / (F.col("na") * F.col("nb"))
    return (
        cand.join(F.broadcast(ea), "id_a")
        .join(F.broadcast(eb), "id_b")
        .withColumn("cos", cos)
        .filter(F.col("cos") >= _COS_THRESHOLD)
        .select("id_a", "id_b", F.round("cos", 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


@register("kmeans_clusters_np", driver=False)  # fast tier; agreement-gated in pytest
def kmeans_clusters_np(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLAS fast tier of kmeans_clusters: broadcast-centroid mapInPandas
    argmin (zero assignment shuffle) — the production Lloyd shape; see
    operators/kmeans.py::kmeans_assignments_np."""
    return KM.kmeans_assignments_np(_emb(spark, sf_dir), k=_K, iters=_ITERS).orderBy(
        "vec_id"
    )


@register("semantic_dedup_multiprobe_np", driver=False)  # fast tier; agreement-gated
def semantic_dedup_multiprobe_np(
    spark: SparkSession, sf_dir: str, k: int | None = None
) -> DataFrame:
    """BLAS fast tier of semantic_dedup_multiprobe — the tier that fixes
    its sf1 artifact (the interpreted HOF pair stage measured ~106 s at
    native sf1; see PERFORMANCE.md). BLAS end to end: the soft
    assignment is the broadcast-centroid tier (zero corpus shuffle,
    n_probe top cells per point) and each cell's pair stage is one
    applyInPandas matmul. A pair
    sharing several of its sides' n_probe cells is computed once per
    shared cell with identical inputs, so the duplicate rows carry the
    identical double and a groupBy min() dedups them exactly.

    ``k`` is THE scale knob: the soft-assignment pair bill is
    Σ cell_size² ≈ (n_probe·n)²/k, so k must grow with n. Default
    (k=None) follows the same ``_k_for(n)`` schedule as the oracled tier
    — identical k at every agreement-gated SF (schedule floor = {_K}),
    k ∝ n beyond; measured at native sf3 (60k vectors, k=200): 31.1 s
    vs the oracled tier's 128.2 s (PERFORMANCE.md)."""
    emb = _emb(spark, sf_dir)
    if k is None:
        k = _k_for(read_table(spark, sf_dir, "embeddings").count())
    assign = KM.kmeans_assignments_np(emb, k=k, iters=_ITERS, n_probe=_N_PROBE)
    ann = emb.join(assign, "vec_id").select("vec_id", "e", "cluster")
    out = ann.groupBy("cluster").applyInPandas(
        _blas_pairs_in_cluster, schema="id_a long, id_b long, cosine double"
    )
    return (
        out.groupBy("id_a", "id_b")
        .agg(F.min("cosine").alias("cosine"))
        .orderBy("id_a", "id_b")
    )
