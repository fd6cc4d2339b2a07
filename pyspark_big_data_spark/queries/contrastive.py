"""Contrastive training-pair mining over the embeddings table.

Embedding-model training (retrieval/rerankers, SimCSE/DPR-style) needs
(anchor, positive, hard-negative) triplets. The mining rule here:

- anchor set   = vec_id % _PROBE_MOD == 0 (the repo's standing probe set)
- positive     = the anchor's rank-1 cosine neighbor (nearest-neighbor
  proxy for a labeled positive)
- hard negatives = the next-ranked neighbors whose cosine is BELOW the
  near-dup threshold — close enough to be informative, far enough to
  not be a false negative (near-dups of the anchor are EXCLUDED from
  the negative pool; serving a duplicate as a "negative" actively
  poisons a contrastive loss)

This is the batch-mining shape of the hard-negative step in DPR
(Karpukhin et al. 2020) / ANCE: mine with the current index, train,
re-mine. The oracled exact tier is the differential witness; the
registered ``contrastive_triplets_ivf`` IS the 100 TB swap (candidates
from the IVF cells, same ranking/threshold rules), and
``mine_triplets_from_topk`` runs the identical derivation over the
continuous ANN loop's per-batch output — anchors broadcast, the corpus
streams once, and the per-anchor state is a bounded top-(1+_N_NEG)
heap in every tier.

No reference-repo counterpart (the reference has no vector ops at all);
the probe/broadcast scan shape follows queries/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.functions import vectors as V
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register
from pyspark_big_data_spark.queries.similarity import (
    _DD_COS,
    _DD_V,
    _PROBE_MOD,
    _TOP_K,
    guard_allpairs,
)

# Negatives must sit strictly below the near-dup band (same constant the
# near-dup queries use as their "duplicate" threshold): anything >= this
# is a likely duplicate of the anchor, i.e. a false negative.
_NEG_TAU = 0.40
_N_NEG = 3  # hard negatives mined per anchor

_TRIPLETS_ORACLE = f"""
WITH v AS ({_DD_V}),
pairs AS (
    SELECT a.vec_id AS anchor_id, b.vec_id AS neighbor_id, {_DD_COS} AS cos
    FROM (SELECT * FROM v WHERE vec_id % {_PROBE_MOD} = 0) a
    JOIN v b ON b.vec_id <> a.vec_id
), ranked AS (
    SELECT anchor_id, neighbor_id, cos,
           ROW_NUMBER() OVER (
               PARTITION BY anchor_id ORDER BY cos DESC, neighbor_id ASC
           ) AS rnk
    FROM pairs
), pos AS (
    SELECT anchor_id, neighbor_id AS positive_id, ROUND(cos, 6) AS pos_cos
    FROM ranked WHERE rnk = 1
), neg AS (
    SELECT anchor_id, neighbor_id AS negative_id, ROUND(cos, 6) AS neg_cos,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY anchor_id ORDER BY cos DESC, neighbor_id ASC
           ) AS BIGINT) AS neg_rnk
    FROM ranked WHERE rnk > 1 AND cos < {_NEG_TAU}
)
SELECT p.anchor_id AS anchor_id, p.positive_id, p.pos_cos,
       n.negative_id, n.neg_cos, n.neg_rnk
FROM pos p JOIN neg n ON n.anchor_id = p.anchor_id
WHERE n.neg_rnk <= {_N_NEG}
ORDER BY anchor_id, neg_rnk
"""


@register("contrastive_triplets", oracle=_TRIPLETS_ORACLE, driver=False)
def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, positive, hard-negative) triplets for contrastive
    training — see the module docstring for the mining rule and the
    100 TB candidate-generation swap.

    Shape: anchors are a small, broadcastable fraction; the corpus is
    scanned ONCE with the per-pair dot inside whole-stage codegen
    (flattened columns, functions/vectors.py); both rankings partition
    by anchor only — the shuffle carries anchor-keyed candidate rows,
    never the corpus. Exact tier is guarded against silent all-pairs
    blowup exactly like ann_topk_bruteforce."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.to_double_array(F.col("embedding")).alias("e")
    )
    dim_row = emb.select(F.size("e").alias("d")).first()
    dim = dim_row["d"] if dim_row else 0
    with_norm = V.flatten_vec(
        emb.withColumn("nrm", V.norm(F.col("e"))), "e", dim, "_x", ["vec_id", "nrm"]
    )
    anchors = guard_allpairs(
        with_norm.filter(F.col("vec_id") % _PROBE_MOD == 0).select(
            F.col("vec_id").alias("anchor_id"),
            F.col("nrm").alias("an"),
            *[F.col(f"_x{i}").alias(f"_a{i}") for i in range(dim)],
        ),
        "contrastive_triplets anchors",
    )
    pairs = with_norm.join(
        F.broadcast(anchors), F.col("vec_id") != F.col("anchor_id")
    ).select(
        "anchor_id",
        F.col("vec_id").alias("neighbor_id"),
        (V.dot_flat("_a", "_x", dim) / (F.col("an") * F.col("nrm"))).alias("cos"),
    )
    w = Window.partitionBy("anchor_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    ranked = pairs.withColumn("rnk", F.row_number().over(w))
    pos = ranked.filter(F.col("rnk") == 1).select(
        "anchor_id",
        F.col("neighbor_id").alias("positive_id"),
        F.round("cos", 6).alias("pos_cos"),
    )
    neg = (
        ranked.filter((F.col("rnk") > 1) & (F.col("cos") < _NEG_TAU))
        .withColumn("neg_rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("neg_rnk") <= _N_NEG)
        .select(
            "anchor_id",
            F.col("neighbor_id").alias("negative_id"),
            F.round("cos", 6).alias("neg_cos"),
            "neg_rnk",
        )
    )
    # pos is bounded at one row per anchor — broadcast it so the
    # assembly never sort-merges two anchor-keyed frames
    return (
        F.broadcast(pos).join(neg, "anchor_id")
        .select("anchor_id", "positive_id", "pos_cos", "negative_id", "neg_cos", "neg_rnk")
        .orderBy("anchor_id", "neg_rnk")
    )


# ---------------------------------------------------------------------------
# Windowed mining over a ranked top-k frame (the production shape)
# ---------------------------------------------------------------------------


def mine_triplets_from_topk(
    neighbors: DataFrame, tau: float = _NEG_TAU, n_neg: int = _N_NEG
) -> DataFrame:
    """Derive (anchor, positive, hard-negative) triplets from ANY ranked
    top-k neighbor frame ``(probe_id, neighbor_id, cosine, rnk)`` — the
    output contract shared by ann_topk_bruteforce, the IVF tiers, and
    streaming/incremental_ann.process_vector_batch. Production mining
    is exactly this: take the index's top-k, rank 1 is the positive,
    the first ``n_neg`` ranks whose cosine sits below ``tau`` are the
    hard negatives. Pure column algebra over a frame that is already
    bounded (probes x k rows), so it composes with the continuous ANN
    loop at zero extra scan cost — mine each micro-batch's neighbor
    output as it lands and the hard-negative set refreshes with the
    index (the ANCE loop).

    Windowed mining is exact where it matters: whenever the window
    yields the full ``n_neg`` quota, those ARE the globally top-ranked
    sub-tau negatives (anything outside the window ranks below every
    in-window item under the same (cos desc, id asc) comparator) —
    asserted against the full-ranking miner in
    tests/test_split_contrastive.py."""
    pos = neighbors.filter(F.col("rnk") == 1).select(
        F.col("probe_id").alias("anchor_id"),
        F.col("neighbor_id").alias("positive_id"),
        F.col("cosine").alias("pos_cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("rnk").asc())
    neg = (
        neighbors.filter((F.col("rnk") > 1) & (F.col("cosine") < tau))
        .withColumn("neg_rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("neg_rnk") <= n_neg)
        .select(
            F.col("probe_id").alias("anchor_id"),
            F.col("neighbor_id").alias("negative_id"),
            F.col("cosine").alias("neg_cos"),
            "neg_rnk",
        )
    )
    # same bounded-build-side reasoning as the full-ranking miner
    return (
        F.broadcast(pos).join(neg, "anchor_id")
        .select("anchor_id", "positive_id", "pos_cos", "negative_id", "neg_cos", "neg_rnk")
        .orderBy("anchor_id", "neg_rnk")
    )


_TOPK_TRIPLETS_ORACLE = f"""
WITH v AS ({_DD_V}),
pairs AS (
    SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, {_DD_COS} AS cos
    FROM (SELECT * FROM v WHERE vec_id % {_PROBE_MOD} = 0) a
    JOIN v b ON b.vec_id <> a.vec_id
), ranked AS (
    SELECT probe_id, neighbor_id, ROUND(cos, 6) AS cosine,
           ROW_NUMBER() OVER (
               PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC
           ) AS rnk
    FROM pairs
), topk AS (
    SELECT * FROM ranked WHERE rnk <= {_TOP_K}
), pos AS (
    SELECT probe_id AS anchor_id, neighbor_id AS positive_id, cosine AS pos_cos
    FROM topk WHERE rnk = 1
), neg AS (
    SELECT probe_id AS anchor_id, neighbor_id AS negative_id, cosine AS neg_cos,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY probe_id ORDER BY rnk ASC
           ) AS BIGINT) AS neg_rnk
    FROM topk WHERE rnk > 1 AND cosine < {_NEG_TAU}
)
SELECT p.anchor_id AS anchor_id, p.positive_id, p.pos_cos,
       n.negative_id, n.neg_cos, n.neg_rnk
FROM pos p JOIN neg n ON n.anchor_id = p.anchor_id
WHERE n.neg_rnk <= {_N_NEG}
ORDER BY anchor_id, neg_rnk
"""


@register("contrastive_triplets_topk", oracle=_TOPK_TRIPLETS_ORACLE, driver=False)
def contrastive_triplets_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed triplet mining from the exact top-{_TOP_K} ANN output —
    the shape a production loop runs (mine from the index's top-k, not
    from a full ranking). Negatives threshold on the ROUNDED cosine the
    top-k contract carries, mirrored exactly in the oracle. At 100 TB
    the input swaps to the IVF/quantized tiers or the continuous loop's
    per-batch neighbor output; this derivation is unchanged."""
    from pyspark_big_data_spark.queries.similarity import ann_topk_bruteforce

    return mine_triplets_from_topk(ann_topk_bruteforce(spark, sf_dir))


# ---------------------------------------------------------------------------
# IVF-composed mining: the 100 TB candidate-generation shape, oracled
# ---------------------------------------------------------------------------

def _ivf_triplets_oracle() -> str:
    from pyspark_big_data_spark.queries.ann_ivf import _IVF_ORACLE

    return f"""
WITH topk AS ({_IVF_ORACLE}),
pos AS (
    SELECT probe_id AS anchor_id, neighbor_id AS positive_id, cosine AS pos_cos
    FROM topk WHERE rnk = 1
), neg AS (
    SELECT probe_id AS anchor_id, neighbor_id AS negative_id, cosine AS neg_cos,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY probe_id ORDER BY rnk ASC
           ) AS BIGINT) AS neg_rnk
    FROM topk WHERE rnk > 1 AND cosine < {_NEG_TAU}
)
SELECT p.anchor_id AS anchor_id, p.positive_id, p.pos_cos,
       n.negative_id, n.neg_cos, n.neg_rnk
FROM pos p JOIN neg n ON n.anchor_id = p.anchor_id
WHERE n.neg_rnk <= {_N_NEG}
ORDER BY anchor_id, neg_rnk
"""


@register("contrastive_triplets_ivf", oracle=_ivf_triplets_oracle(), driver=False)
def contrastive_triplets_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet mining composed with the IVF ANN tier — the shape that
    actually runs at 100 TB: candidates come from the probed cells (a
    cell equi-join with broadcast centroids, never a corpus scan per
    anchor), and the miner is the same bounded derivation. Oracle wraps
    the IVF tier's full generated SQL (decimal-exact centroids, cell
    assignment, QUALIFY top-k) in a CTE and mines from it — the whole
    composition is differentially verified, not just the final step."""
    from pyspark_big_data_spark.queries.ann_ivf import ann_topk_ivf

    return mine_triplets_from_topk(ann_topk_ivf(spark, sf_dir))
