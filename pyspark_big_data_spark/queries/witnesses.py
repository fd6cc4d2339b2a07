"""Driver-verifiable agreement witnesses for the rows-only scale tiers.

Round 5 introduced the pattern (``ann_bruteforce_np_agreement`` /
``ann_ivf_np_agreement``): a Spark-side join of a fast (BLAS / sketch)
tier against its ORACLED exact twin, reduced to a one-row digest whose
truth is trivially derivable in ANSI SQL — so the external differential
driver can verify tiers whose raw outputs have no DuckDB twin (float
summation order, engine-specific sketch binaries). This module extends
the pattern to every remaining ANN / clustering / sketch scale tier,
reproducing the reference's cross-API-agreement methodology
(/root/reference/README.md:131-140, rdd/sql/df differential runs)
across execution tiers.

Digest contract: each witness emits ``(n_exact, gate_ok)`` (or a named
count + ``gate_ok``). ``n_exact`` is recomputed INDEPENDENTLY by DuckDB
from the exact tier's full oracle SQL — so the oracle re-verifies the
exact tier while pinning the digest row — and ``gate_ok`` is pinned to
the literal 1: any agreement break (dropped rows, cosine divergence
past tolerance, cluster flips past the gate) flips it to 0 and the
driver row goes red on the value hash.

Gate levels mirror the pytest gates exactly (tests/test_quantization.py,
test_truncated_ann.py, test_clustering.py, test_ivfpq.py,
test_operators.py): tolerance tiers demand >=98% key overlap and
<2e-6 cosine agreement on the overlap (BLAS-vs-fold float summation can
only flip pool-boundary ties); equality tiers demand >=98% identical
assignments; the IVFPQ tier is recall/membership-gated (its routing
ceiling is documented in queries/ivfpq.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

# pool-boundary / summation-order tolerance — same constant as
# similarity._AGREE_TOL (6dp-rounded outputs: real divergence >= 1e-6,
# order artifact < 2e-6)
_TOL = 2e-6
_MIN_OVERLAP = 0.98


def _digest(n_exact: Column, gate: Column, n_name: str = "n_exact") -> list[Column]:
    return [n_exact.cast("long").alias(n_name), gate.cast("long").alias("gate_ok")]


def tolerance_agreement_digest(
    exact: DataFrame,
    fast: DataFrame,
    keys: list[str],
    val: str = "cosine",
    tol: float = _TOL,
    min_overlap: float = _MIN_OVERLAP,
    require_count_eq: bool = True,
    n_name: str = "n_exact",
) -> DataFrame:
    """One-row (n_exact, gate_ok) digest of fast-vs-exact agreement.

    Full-outer join on ``keys`` so rows missing from EITHER side count
    against the overlap; the gate holds iff (a) the fast tier emitted
    the same row count (when ``require_count_eq`` — top-k contracts fix
    the count; threshold-pair contracts don't), (b) key overlap covers
    ``min_overlap`` of the larger side, and (c) every overlapping key's
    value agrees within ``tol``. Single aggregation — the witness adds
    one join + one 1-row agg on top of the two tiers' own plans."""
    ex = exact.select(*keys, F.col(val).alias("_v_exact"))
    fa = fast.select(*keys, F.col(val).alias("_v_fast"))
    both = F.col("_v_exact").isNotNull() & F.col("_v_fast").isNotNull()
    agg = (
        ex.join(fa, keys, "full_outer")
        .agg(
            F.count("_v_exact").alias("n_exact"),
            F.count("_v_fast").alias("n_fast"),
            F.sum(F.when(both, 1).otherwise(0)).alias("n_overlap"),
            F.max(F.when(both, F.abs(F.col("_v_exact") - F.col("_v_fast")))).alias(
                "max_diff"
            ),
        )
    )
    ok_counts = (
        (F.col("n_fast") == F.col("n_exact")) if require_count_eq else F.lit(True)
    )
    denom = F.greatest(F.col("n_exact"), F.col("n_fast"))
    ok_overlap = F.col("n_overlap") >= (F.lit(min_overlap) * denom)
    ok_vals = F.col("max_diff").isNull() | (F.col("max_diff") < tol)
    # Non-vacuity: an empty exact side must not read as agreement
    # (max_diff is null and 0 >= 0 would otherwise gate green). Both
    # sides of the differential emit gate_ok=0 on empty input, so a
    # degenerate SF stays hash-consistent but visibly not-agreeing.
    ok_nonempty = F.col("n_exact") > 0
    gate = F.when(ok_counts & ok_overlap & ok_vals & ok_nonempty, 1).otherwise(0)
    return agg.select(*_digest(F.col("n_exact"), gate, n_name))


def _wrap_count_oracle(inner_sql: str, n_name: str = "n_exact") -> str:
    """The witness oracle: DuckDB independently recomputes the exact
    tier's full pipeline and counts its rows; gate_ok mirrors the Spark
    side's non-vacuity clause (1 only when the exact tier is non-empty)."""
    return (
        f"SELECT CAST(COUNT(*) AS BIGINT) AS {n_name},"
        f" CAST(CASE WHEN COUNT(*) > 0 THEN 1 ELSE 0 END AS BIGINT) AS gate_ok"
        f" FROM ({inner_sql})"
    )


# ---------------------------------------------------------------------------
# int8-GEMM tier vs the oracled int8 tier
# ---------------------------------------------------------------------------


def _quant_oracle() -> str:
    from pyspark_big_data_spark.queries.quantization import _QANN_ORACLE

    return _wrap_count_oracle(_QANN_ORACLE)


@register("ann_quantized_np_agreement", oracle=_quant_oracle())
def ann_quantized_np_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver witness for ann_topk_quantized_np (the int8-GEMM
    production path): its top-k must match the oracled int8 tier on
    >=98% of (probe, neighbor) keys with 6dp-cosine agreement —
    divergence is possible only where the dequantize multiply order
    flips a pool-boundary tie (same gate as
    tests/test_quantization.py::test_int8_gemm_tier_matches_oracled_tier)."""
    from pyspark_big_data_spark.queries.quantization import (
        ann_topk_quantized,
        ann_topk_quantized_np,
    )

    return tolerance_agreement_digest(
        ann_topk_quantized(spark, sf_dir),
        ann_topk_quantized_np(spark, sf_dir),
        keys=["probe_id", "neighbor_id"],
    )


# ---------------------------------------------------------------------------
# prefix-dim BLAS tier vs the oracled truncated tier
# ---------------------------------------------------------------------------


def _trunc_oracle() -> str:
    from pyspark_big_data_spark.queries.truncated_ann import _TANN_ORACLE

    return _wrap_count_oracle(_TANN_ORACLE)


@register("ann_truncated_np_agreement", oracle=_trunc_oracle())
def ann_truncated_np_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver witness for ann_topk_truncated_np (prefix-dim GEMM +
    full-precision rescore): >=98% key overlap with the oracled
    truncated tier, 6dp cosine agreement on the overlap (gate of
    tests/test_truncated_ann.py)."""
    from pyspark_big_data_spark.queries.truncated_ann import (
        ann_topk_truncated,
        ann_topk_truncated_np,
    )

    return tolerance_agreement_digest(
        ann_topk_truncated(spark, sf_dir),
        ann_topk_truncated_np(spark, sf_dir),
        keys=["probe_id", "neighbor_id"],
    )


# ---------------------------------------------------------------------------
# IVF x int8 composition vs the oracled fp IVF tier
# ---------------------------------------------------------------------------


def _ivfq_oracle() -> str:
    from pyspark_big_data_spark.queries.ann_ivf import _IVF_ORACLE

    return _wrap_count_oracle(_IVF_ORACLE)


@register("ann_ivf_quantized_agreement", oracle=_ivfq_oracle())
def ann_ivf_quantized_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver witness for ann_topk_ivf_quantized (the FAISS IVF+SQ
    composition): it searches the SAME top-NPROBE cells as the oracled
    fp IVF tier and int8 at dim 64 is near-lossless, so its top-k must
    overlap the fp tier's on >=98% of keys with 6dp cosine agreement
    (gate of tests/test_quantization.py::test_ivf_quantized_matches_
    fp_ivf_tier, anchored here to the ORACLED tier so the chain ends at
    DuckDB)."""
    from pyspark_big_data_spark.queries.ann_ivf import ann_topk_ivf
    from pyspark_big_data_spark.queries.quantization import ann_topk_ivf_quantized

    return tolerance_agreement_digest(
        ann_topk_ivf(spark, sf_dir),
        ann_topk_ivf_quantized(spark, sf_dir),
        keys=["probe_id", "neighbor_id"],
    )


# ---------------------------------------------------------------------------
# k-means BLAS tier vs the oracled decimal-exact tier
# ---------------------------------------------------------------------------

_KMEANS_WITNESS_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors, CAST(1 AS BIGINT) AS gate_ok
FROM embeddings
"""


@register("kmeans_np_agreement", oracle=_KMEANS_WITNESS_ORACLE)
def kmeans_np_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver witness for kmeans_clusters_np (broadcast-centroid
    mapInPandas Lloyd): every vector must be assigned in both tiers and
    >=98% of assignments must be identical — double-vs-decimal distance
    sums can flip only near-tied argmins (gate of
    tests/test_clustering.py::test_kmeans_np_tier_agrees_with_exact)."""
    from pyspark_big_data_spark.queries.clustering import (
        kmeans_clusters,
        kmeans_clusters_np,
    )

    ex = kmeans_clusters(spark, sf_dir).select("vec_id", F.col("cluster").alias("_c_exact"))
    fa = kmeans_clusters_np(spark, sf_dir).select(
        "vec_id", F.col("cluster").alias("_c_fast")
    )
    both = F.col("_c_exact").isNotNull() & F.col("_c_fast").isNotNull()
    agg = ex.join(fa, ["vec_id"], "full_outer").agg(
        F.count("_c_exact").alias("n_exact"),
        F.count("_c_fast").alias("n_fast"),
        F.sum(F.when(both, 1).otherwise(0)).alias("n_both"),
        F.sum(F.when(both & (F.col("_c_exact") == F.col("_c_fast")), 1).otherwise(0)).alias(
            "n_agree"
        ),
    )
    gate = F.when(
        (F.col("n_fast") == F.col("n_exact"))
        & (F.col("n_both") == F.col("n_exact"))
        & (F.col("n_agree") >= F.lit(_MIN_OVERLAP) * F.col("n_exact")),
        1,
    ).otherwise(0)
    return agg.select(*_digest(F.col("n_exact"), gate, "n_vectors"))


# ---------------------------------------------------------------------------
# multi-probe SemDeDup BLAS tier vs the oracled multi-probe tier
# ---------------------------------------------------------------------------


def _mp_oracle() -> str:
    from pyspark_big_data_spark.queries.clustering import _MULTIPROBE_ORACLE

    return _wrap_count_oracle(_MULTIPROBE_ORACLE, n_name="n_pairs")


@register("semantic_multiprobe_np_agreement", oracle=_mp_oracle())
def semantic_multiprobe_np_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver witness for semantic_dedup_multiprobe_np (soft-assign +
    per-cell matmul): >=98% pair overlap with the oracled multi-probe
    tier, 6dp cosine agreement on the overlap. Threshold-pair contract
    — BLAS summation can flip pairs whose cosine ties the threshold to
    ~1e-12, so exact count equality is NOT required (gate of
    tests/test_clustering.py::test_multiprobe_np_tier_matches_exact)."""
    from pyspark_big_data_spark.queries.clustering import (
        semantic_dedup_multiprobe,
        semantic_dedup_multiprobe_np,
    )

    return tolerance_agreement_digest(
        semantic_dedup_multiprobe(spark, sf_dir),
        semantic_dedup_multiprobe_np(spark, sf_dir),
        keys=["id_a", "id_b"],
        require_count_eq=False,
        n_name="n_pairs",
    )


# ---------------------------------------------------------------------------
# IVFPQ: recall-floor + cell-count witness (routing-bounded by design)
# ---------------------------------------------------------------------------

# Routing-bounded recall floors (queries/ivfpq.py docstring): label cells
# carry no similarity structure on this synthetic data, so the ceiling is
# ~NPROBE/num_cells (measured 0.62 at sf0.01, residual-PQ retains 0.58);
# at 500 vectors the K=64 codebook is additionally starved (measured
# 0.30). The floor switches at the corpus size where the tier becomes
# representative — same split as tests/test_ivfpq.py.
_IVFPQ_FLOOR_SMALL = 0.25
_IVFPQ_FLOOR = 0.45
_IVFPQ_REPRESENTATIVE_N = 2000


def _ivfpq_witness_oracle() -> str:
    from pyspark_big_data_spark.queries.ivfpq import _PROBE_MOD

    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_probes, CAST(1 AS BIGINT) AS gate_ok
FROM embeddings WHERE vec_id % {_PROBE_MOD} = 0
"""


@register("ann_ivfpq_witness", oracle=_ivfpq_witness_oracle())
def ann_ivfpq_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver witness for ann_topk_ivfpq (residual-PQ over IVF cells —
    the FAISS IVFPQ shape): gate = (a) every probe answered with exactly
    k neighbors, (b) no probe's neighbors span more than NPROBE distinct
    cells (the candidate-count guarantee the composition exists for),
    (c) recall@k vs exact L2 holds the routing-bounded floor
    ({_IVFPQ_FLOOR} past {_IVFPQ_REPRESENTATIVE_N} vectors,
    {_IVFPQ_FLOOR_SMALL} below — codebook-starved, see
    tests/test_ivfpq.py). The exact-L2 truth is computed Spark-side as
    a guarded corpus x broadcast(probes) scan — independent of every
    IVFPQ stage."""
    from pyspark_big_data_spark.functions import vectors as V
    from pyspark_big_data_spark.queries.ivfpq import (
        _NPROBE,
        _PROBE_MOD,
        _TOP_K,
        ann_topk_ivfpq,
    )
    from pyspark_big_data_spark.queries.similarity import guard_allpairs

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"), "label"
    )
    dim_row = emb.select(F.size("e").alias("d")).first()
    dim = dim_row["d"] if dim_row else 0
    n_row = emb.count()
    floor = _IVFPQ_FLOOR if n_row >= _IVFPQ_REPRESENTATIVE_N else _IVFPQ_FLOOR_SMALL

    # exact L2 truth: corpus x broadcast(probes) over flat codegen
    # columns, per-probe top-k window (ties -> smaller id, matching the
    # lexsort convention in tests/test_ivfpq.py)
    flat = V.flatten_vec(emb.select("vec_id", "e"), "e", dim, "_x", ["vec_id"])
    probes = guard_allpairs(
        flat.filter(F.col("vec_id") % _PROBE_MOD == 0).select(
            F.col("vec_id").alias("probe_id"),
            *[F.col(f"_x{i}").alias(f"_p{i}") for i in range(dim)],
        ),
        "ann_ivfpq_witness probes",
    )
    d2 = F.lit(0.0)
    for i in range(dim):
        diff = F.col(f"_x{i}") - F.col(f"_p{i}")
        d2 = d2 + diff * diff
    w = Window.partitionBy("probe_id").orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    exact = (
        flat.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", d2.alias("d2"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("probe_id", F.col("vec_id").alias("_nb_exact"))
    )

    got = ann_topk_ivfpq(spark, sf_dir).select(
        "probe_id", F.col("vec_id").alias("_nb_got")
    )
    labels = emb.select(F.col("vec_id").alias("_nb_got"), "label")

    per_probe = (
        got.join(F.broadcast(labels), "_nb_got")
        .groupBy("probe_id")
        .agg(
            F.count(F.lit(1)).alias("n_nbrs"),
            F.countDistinct("label").alias("n_cells"),
        )
    )
    hits = (
        got.join(
            exact,
            (got["probe_id"] == exact["probe_id"])
            & (F.col("_nb_got") == F.col("_nb_exact")),
        )
        .groupBy(got["probe_id"].alias("probe_id"))
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    agg = (
        per_probe.join(hits, "probe_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum(F.when(F.col("n_nbrs") == _TOP_K, 0).otherwise(1)).alias("bad_k"),
            F.sum(F.when(F.col("n_cells") <= _NPROBE, 0).otherwise(1)).alias("bad_cells"),
            (
                F.sum(F.coalesce(F.col("n_hit"), F.lit(0)))
                / (F.count(F.lit(1)) * F.lit(float(_TOP_K)))
            ).alias("recall"),
        )
    )
    gate = F.when(
        (F.col("bad_k") == 0)
        & (F.col("bad_cells") == 0)
        & (F.col("recall") >= F.lit(floor)),
        1,
    ).otherwise(0)
    return agg.select(*_digest(F.col("n_probes"), gate, "n_probes"))


# ---------------------------------------------------------------------------
# HLL overlap sketch vs the oracled exact intersection
# ---------------------------------------------------------------------------


def _overlap_oracle() -> str:
    from pyspark_big_data_spark.queries.cleaning import _OVERLAP_ORACLE

    return (
        "SELECT CAST(n_overlap AS BIGINT) AS n_overlap,"
        f" CAST(1 AS BIGINT) AS gate_ok FROM ({_OVERLAP_ORACLE})"
    )


# ---------------------------------------------------------------------------
# r7-queue witnesses (driver=False: the r6 surface is full at 50; these
# externalize the last unwitnessed rows-only tiers and head the queue)
# ---------------------------------------------------------------------------


def _fast_minhash_oracle() -> str:
    from pyspark_big_data_spark.operators import dedup as DD
    from pyspark_big_data_spark.queries.dedup import _AGREE, _dd_minhash_cte

    return f"""{_dd_minhash_cte()},
filtered AS (
    SELECT c.id_a, c.id_b FROM cand c
    JOIN sigs x ON x.doc_id = c.id_a
    JOIN sigs y ON y.doc_id = c.id_b
    WHERE ({_AGREE}) / {float(DD.NUM_HASHES)} >= 0.5
),
dsh AS (SELECT DISTINCT doc_id, s FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM dsh GROUP BY doc_id),
inter AS (
    SELECT f.id_a, f.id_b, COUNT(*) AS n_inter
    FROM filtered f
    JOIN dsh x ON x.doc_id = f.id_a
    JOIN dsh y ON y.doc_id = f.id_b AND y.s = x.s
    GROUP BY f.id_a, f.id_b
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_truth, CAST(1 AS BIGINT) AS gate_ok
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.8
"""


@register("minhash_fast_tier_witness", oracle=_fast_minhash_oracle(), driver=False)
def minhash_fast_tier_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver witness for dedup_minhash_fast (the xxhash64 production
    tier, which has no DuckDB twin by construction): it must recover
    >=90% of the TRUE near-dups — exact shingle Jaccard >= 0.8, truth
    set independently recomputed by DuckDB from the md5 pipeline —
    mirroring tests/test_corpus_ops.py::test_fast_minhash_tier_finds_
    true_near_dups (borderline est-band pairs flip freely between hash
    families; true near-dups must not)."""
    from pyspark_big_data_spark.operators import dedup as DD
    from pyspark_big_data_spark.queries.dedup import (
        dedup_minhash_fast,
        dedup_minhash_lsh,
    )

    docs = read_table(spark, sf_dir, "documents")
    md5_cand = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    truth = (
        DD.exact_jaccard(md5_cand, DD.shingles(docs))
        .filter(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b")
    )
    fast = dedup_minhash_fast(spark, sf_dir).select(
        "id_a", "id_b", F.lit(1).alias("_found")
    )
    agg = truth.join(fast, ["id_a", "id_b"], "left").agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.coalesce(F.sum(F.col("_found")), F.lit(0)).alias("n_found"),
    )
    gate = F.when(
        F.col("n_found") >= F.lit(0.9) * F.col("n_truth"), 1
    ).otherwise(0)
    return agg.select(*_digest(F.col("n_truth"), gate, "n_truth"))


_PCA_WITNESS_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors, CAST(1 AS BIGINT) AS gate_ok
FROM embeddings
"""


@register("pca_project_witness", oracle=_PCA_WITNESS_ORACLE, driver=False)
def pca_project_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver witness for embedding_pca_project (no SQL twin for eigh):
    gate = (a) the returned components are orthonormal (|C Cᵀ - I| <
    1e-8, driver-side on the r x dim matrix), (b) every vector is
    projected, (c) the DISTRIBUTED per-component variance of the
    projections matches the driver-side eigenvalues within 1e-6
    relative — the spectral property that makes the projection PCA and
    not just any linear map, checked across the Arrow moments pass, the
    eigh, and the codegen projection path at once."""
    import numpy as np

    from pyspark_big_data_spark.queries.pca_reduce import _R, pca_project

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    dim_row = emb.select(F.size("e").alias("d")).first()
    dim = dim_row["d"] if dim_row else 64
    out, vals, comps = pca_project(emb, dim)
    ortho_err = float(np.abs(comps @ comps.T - np.eye(comps.shape[0])).max())
    aggs = [F.count(F.lit(1)).alias("n_vectors")]
    aggs += [F.var_pop(f"p{i}").alias(f"_v{i}") for i in range(_R)]
    row = out.agg(*aggs)
    ok_var = F.lit(True)
    for i in range(_R):
        ok_var = ok_var & (
            F.abs(F.col(f"_v{i}") - F.lit(float(vals[i])))
            <= F.lit(1e-6) * F.greatest(F.abs(F.lit(float(vals[i]))), F.lit(1e-12))
        )
    gate = F.when(F.lit(ortho_err < 1e-8) & ok_var, 1).otherwise(0)
    return row.select(*_digest(F.col("n_vectors"), gate, "n_vectors"))


def _hll_distinct_oracle() -> str:
    return """
SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(1 AS BIGINT) AS gate_ok
FROM events
"""


@register("hll_distinct_witness", oracle=_hll_distinct_oracle(), driver=False)
def hll_distinct_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver witness for distinct_users_hll_sketch: every event type's
    HLL estimate must sit within the published error envelope of the
    exact distinct count (|est - exact| <= max(3, 8% exact) per type —
    wider than the 5% corpus-level pytest gate because per-type counts
    are smaller), and both tiers must cover the same types."""
    from pyspark_big_data_spark.queries.cleaning import (
        distinct_users_by_type,
        distinct_users_hll_sketch,
    )

    ex = distinct_users_by_type(spark, sf_dir).select(
        "event_type", F.col("n_users").alias("_exact")
    )
    est = distinct_users_hll_sketch(spark, sf_dir).select(
        "event_type", F.col("n_users_est").alias("_est")
    )
    both = F.col("_exact").isNotNull() & F.col("_est").isNotNull()
    ok = both & (
        F.abs(F.col("_est") - F.col("_exact"))
        <= F.greatest(F.lit(3.0), F.lit(0.08) * F.col("_exact"))
    )
    agg = ex.join(est, ["event_type"], "full_outer").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(ok, 1).otherwise(0)).alias("n_ok"),
    )
    gate = F.when(F.col("n_ok") == F.col("n_types"), 1).otherwise(0)
    return agg.select(*_digest(F.col("n_types"), gate, "n_types"))


def _semantic_np_oracle() -> str:
    from pyspark_big_data_spark.queries.clustering import _SEMANTIC_ORACLE

    return _wrap_count_oracle(_SEMANTIC_ORACLE)


@register("semantic_dedup_np_agreement", oracle=_semantic_np_oracle(), driver=False)
def semantic_dedup_np_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver witness for semantic_dedup_np (the per-cluster BLAS matmul
    tier): it must emit the IDENTICAL pair set as the oracled
    semantic_dedup (both sides reuse the same decimal-exact Lloyd
    assignment, so the candidate sets match by construction; only the
    cosine arithmetic differs), with 6dp-cosine agreement on every pair
    — the strict-set gate of tests/test_clustering.py. n_exact is the
    oracled tier's pair count, independently recomputed by DuckDB from
    the full unrolled-Lloyd SQL."""
    from pyspark_big_data_spark.queries.clustering import (
        semantic_dedup,
        semantic_dedup_np,
    )

    return tolerance_agreement_digest(
        semantic_dedup(spark, sf_dir),
        semantic_dedup_np(spark, sf_dir),
        keys=["id_a", "id_b"],
        val="cosine",
        min_overlap=1.0,
    )


def _ivf_kmeans_oracle() -> str:
    from pyspark_big_data_spark.queries.similarity import _ANN_ORACLE

    return _wrap_count_oracle(_ANN_ORACLE)


@register("ann_ivf_kmeans_witness", oracle=_ivf_kmeans_oracle(), driver=False)
def ann_ivf_kmeans_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver witness for ann_topk_ivf_kmeans (the PRODUCTION IVF:
    learned Lloyd cells instead of the structureless label cells): at
    the same NPROBE scan fraction its recall vs the exact brute-force
    truth must be at least the label-cell tier's (the property the
    k-means index exists for), and every (probe, neighbor) hit it
    shares with the truth must carry the true cosine within {_TOL} —
    the gate of tests/test_similarity_np.py::test_ivf_kmeans_recall_
    beats_label_cells. n_exact is the exact tier's row count,
    independently recomputed by DuckDB from the brute-force oracle."""
    from pyspark_big_data_spark.queries.ann_ivf import (
        ann_topk_ivf_kmeans,
        ann_topk_ivf_np,
    )
    from pyspark_big_data_spark.queries.similarity import ann_topk_bruteforce

    keys = ["probe_id", "neighbor_id"]
    exact = ann_topk_bruteforce(spark, sf_dir).select(
        *keys, F.col("cosine").alias("_c_exact")
    )
    km = ann_topk_ivf_kmeans(spark, sf_dir).select(
        *keys, F.col("cosine").alias("_c_km")
    )
    lab = ann_topk_ivf_np(spark, sf_dir).select(*keys, F.lit(1).alias("_lab"))
    agg = (
        exact.join(km, keys, "left")
        .join(lab, keys, "left")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.when(F.col("_c_km").isNotNull(), 1).otherwise(0)).alias("n_km"),
            F.sum(F.coalesce(F.col("_lab"), F.lit(0))).alias("n_lab"),
            F.max(
                F.when(
                    F.col("_c_km").isNotNull(),
                    F.abs(F.col("_c_km") - F.col("_c_exact")),
                )
            ).alias("max_diff"),
        )
    )
    gate = F.when(
        (F.col("n_km") >= F.col("n_lab"))
        & (F.col("max_diff").isNull() | (F.col("max_diff") < _TOL))
        & (F.col("n_exact") > 0),
        1,
    ).otherwise(0)
    return agg.select(*_digest(F.col("n_exact"), gate, "n_exact"))


_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"  # DuckDB

_MINHASH_ML_ORACLE = f"""
WITH n AS (SELECT doc_id, {_NORM_SQL} AS norm FROM documents)
SELECT CAST(COUNT(*) AS BIGINT) AS n_truth, CAST(1 AS BIGINT) AS gate_ok
FROM n a JOIN n b ON a.norm = b.norm AND a.doc_id < b.doc_id
"""


@register("minhash_ml_witness", oracle=_MINHASH_ML_ORACLE, driver=False)
def minhash_ml_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver witness for dedup_minhash_ml (the stock pyspark.ml
    MinHashLSH tier — JVM hash seeds, no SQL twin by construction):
    every TRUE exact-duplicate pair (identical normalized text —
    Jaccard distance 0, which no LSH band can miss and no threshold can
    exclude) must be recovered, and the tier must report distance 0.0
    for each — the containment gate of tests/test_ml_lsh.py. n_truth is
    the exact-dup pair count, independently recomputed by DuckDB from
    the normalized text."""
    from pyspark_big_data_spark.functions.text import normalize_text
    from pyspark_big_data_spark.operators.ml_lsh import minhash_ml_near_dup

    docs = read_table(spark, sf_dir, "documents")
    n = docs.select("doc_id", normalize_text(F.col("text")).alias("norm"))
    a = n.select(F.col("doc_id").alias("id_a"), "norm")
    b = n.select(F.col("doc_id").alias("id_b"), F.col("norm").alias("norm_b"))
    truth = a.join(
        b, (F.col("norm") == F.col("norm_b")) & (F.col("id_a") < F.col("id_b"))
    ).select("id_a", "id_b")
    ml = minhash_ml_near_dup(docs, jaccard_distance_max=0.3).select(
        "id_a", "id_b", F.col("jaccard_dist").alias("_d")
    )
    agg = truth.join(ml, ["id_a", "id_b"], "left").agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.coalesce(
            F.sum(F.when(F.col("_d").isNotNull(), 1).otherwise(0)), F.lit(0)
        ).alias("n_found"),  # sum over an EMPTY truth set is NULL, not 0
        F.max(F.col("_d")).alias("max_d"),
    )
    gate = F.when(
        (F.col("n_found") == F.col("n_truth"))
        & (F.col("max_d").isNull() | (F.col("max_d") == 0.0)),
        1,
    ).otherwise(0)
    return agg.select(*_digest(F.col("n_truth"), gate, "n_truth"))


_BRP_FLOOR = 0.5  # LSH recall floor at 6 hash tables (tests/test_ml_lsh.py)


def _brp_ml_oracle() -> str:
    from pyspark_big_data_spark.queries.similarity import _NEAR_DUP_ORACLE

    return _wrap_count_oracle(_NEAR_DUP_ORACLE, "n_truth")


@register("brp_lsh_ml_witness", oracle=_brp_ml_oracle(), driver=False)
def brp_lsh_ml_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver witness for ann_brp_lsh_ml (stock pyspark.ml
    BucketedRandomProjectionLSH — JVM hash seeds, no SQL twin): at 6
    hash tables it must recover >= {_BRP_FLOOR:.0%} of the true
    near-dup pairs (cosine >= 0.4, i.e. euclidean <= ~1.095 on these
    unit-norm vectors — strictly inside the 1.2 search radius), truth
    independently recomputed by DuckDB via the guarded all-pairs
    oracle. Mirrors tests/test_ml_lsh.py::test_brp_lsh_recall_vs_exact."""
    from pyspark_big_data_spark.operators.ml_lsh import brp_lsh_near_neighbors
    from pyspark_big_data_spark.queries.similarity import embedding_near_dup

    truth = embedding_near_dup(spark, sf_dir).select("id_a", "id_b")
    emb = read_table(spark, sf_dir, "embeddings")
    ml = brp_lsh_near_neighbors(emb, euclidean_max=1.2, num_hash_tables=6).select(
        "id_a", "id_b", F.lit(1).alias("_found")
    )
    agg = truth.join(ml, ["id_a", "id_b"], "left").agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.coalesce(F.sum(F.col("_found")), F.lit(0)).alias("n_found"),
    )
    gate = F.when(
        (F.col("n_found") >= F.lit(_BRP_FLOOR) * F.col("n_truth"))
        & (F.col("n_truth") > 0),
        1,
    ).otherwise(0)
    return agg.select(*_digest(F.col("n_truth"), gate, "n_truth"))


def _json_typed_oracle() -> str:
    from pyspark_big_data_spark.queries.semi_structured import _JSON_ORACLE

    return _wrap_count_oracle(_JSON_ORACLE, "n_groups")


@register("json_typed_agreement", oracle=_json_typed_oracle(), driver=False)
def json_typed_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver witness for json_props_typed (the from_json bulk-typed
    parse path): its aggregate must match the VARIANT path's row for
    row — same groups, same counts, same decimal-exact sums (three
    independent parse paths over the same payloads: get_json_object is
    the oracled baseline, variant is driver-verified, and this digest
    pins the typed path to the variant path). n_groups is recomputed by
    DuckDB via json_extract."""
    from pyspark_big_data_spark.queries.semi_structured import (
        json_props_typed,
        json_props_variant,
    )

    keys = ["event_type", "k_bucket"]
    ty = json_props_typed(spark, sf_dir).select(
        *keys, F.col("cnt").alias("_c_t"), F.col("sum_value").alias("_s_t")
    )
    va = json_props_variant(spark, sf_dir).select(
        *keys, F.col("cnt").alias("_c_v"), F.col("sum_value").alias("_s_v")
    )
    both = F.col("_c_t").isNotNull() & F.col("_c_v").isNotNull()
    row_ok = both & (F.col("_c_t") == F.col("_c_v")) & (F.col("_s_t") == F.col("_s_v"))
    agg = ty.join(va, keys, "full_outer").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(row_ok, 1).otherwise(0)).alias("n_ok"),
    )
    gate = F.when(
        (F.col("n_ok") == F.col("n_groups")) & (F.col("n_groups") > 0), 1
    ).otherwise(0)
    return agg.select(*_digest(F.col("n_groups"), gate, "n_groups"))


@register("user_overlap_sketch_witness", oracle=_overlap_oracle())
def user_overlap_sketch_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver witness for user_overlap_sketch (HLL inclusion-exclusion):
    the estimate must sit inside the compounded HLL error envelope
    around the exact intersection — |est - exact| <= max(3, 10% exact),
    three ~2%-RSE estimates compounding (gate of tests/test_operators.py
    ::test_hll_overlap_inclusion_exclusion_accuracy). n_overlap is the
    EXACT intersection, independently recomputed by DuckDB."""
    from pyspark_big_data_spark.queries.cleaning import (
        user_overlap_exact,
        user_overlap_sketch,
    )

    ex = user_overlap_exact(spark, sf_dir)
    est = user_overlap_sketch(spark, sf_dir)
    j = ex.crossJoin(F.broadcast(est))
    gate = F.when(
        F.abs(F.col("n_overlap_est") - F.col("n_overlap"))
        <= F.greatest(F.lit(3.0), F.lit(0.10) * F.col("n_overlap")),
        1,
    ).otherwise(0)
    return j.select(*_digest(F.col("n_overlap"), gate, "n_overlap"))
