"""Hybrid lexical+dense retrieval with Reciprocal Rank Fusion.

The canonical RAG / training-data-curation retrieval stack: a lexical
ranker (BM25 over the fixed term set, shared with bm25_topk) and a
dense ranker (cosine over the feature-hashed document vectors, shared
with doc_embed_hash) each produce a truncated top-N list, fused by RRF
(Cormack et al., SIGIR'09): score(d) = Σ_lists 1 / (K + rank_list(d)),
K = 60, documents missing from a list contribute 0.

Differential-oracle exactness, piece by piece:
- the lexical ranks reuse bm25_scored_cte()'s ROUND(score, 6) and the
  (score DESC, doc_id) tie-break, so rank order cannot drift on ln()
  ulps;
- the dense side is integer arithmetic (hashed vectors) through the
  dot products — integer-valued doubles sum exactly in ANY order, so
  DuckDB's list_dot_product and Spark's fixed-order flat-column chain
  agree bit-for-bit; cosine is rounded to 6dp before ranking;
- the RRF sum is two IEEE divisions of identical doubles added in one
  fixed order — bit-identical across engines, so even the fused rank
  order needs no rounding fudge (the emitted score is rounded to 9dp
  for the value hash).

Scale shape: both ranker lists are produced by TakeOrderedAndProject
(global top-N, no full sort) and the fusion joins two ≤N-row frames —
everything after the two corpus passes is constant-size. The dense
pass is corpus × broadcast(1 probe row) on flat codegen columns; the
lexical pass is the bm25_scored aggregate. At 100 TB this is two scans
and two bounded top-Ns — the right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.functions import vectors as V
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.corpus_ops import bm25_scored, bm25_scored_cte
from pyspark_big_data_spark.queries.embed_hash import DIM, _dd_embed_cte, hashed_doc_vectors
from pyspark_big_data_spark.queries.registry import register

_PROBE_DOC = 0  # fixed probe document (doc_id 0 exists at every SF)
_LEX_N = 50  # lexical list depth
_DEN_N = 50  # dense list depth
_RRF_K = 60  # the standard RRF damping constant
_FINAL_K = 10


def _embed_cte_body() -> str:
    """embed_hash's CTE chain with the leading WITH stripped, so it can
    be appended to the BM25 chain in one statement."""
    body = _dd_embed_cte().strip()
    assert body.startswith("WITH")
    return body[len("WITH") :]


def _rrf_oracle() -> str:
    dot = "list_dot_product(a.e, b.e)"
    cos = f"{dot} / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))"
    return f"""
{bm25_scored_cte()},
{_embed_cte_body()},
dv AS (SELECT doc_id, CAST(e AS DOUBLE[]) AS e FROM vecs),
dense AS (
    SELECT b.doc_id AS doc_id, ROUND({cos}, 6) AS cos6
    FROM dv a, dv b
    WHERE a.doc_id = {_PROBE_DOC} AND b.doc_id <> {_PROBE_DOC}
),
den AS (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY cos6 DESC, doc_id ASC) AS BIGINT) AS den_rnk
    FROM dense
    QUALIFY den_rnk <= {_DEN_N}
),
lex AS (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS lex_rnk
    FROM scored
    WHERE score > 0 AND doc_id <> {_PROBE_DOC}
    QUALIFY lex_rnk <= {_LEX_N}
),
fused AS (
    SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
           l.lex_rnk AS lex_rnk,
           d.den_rnk AS den_rnk,
           COALESCE(1.0 / ({_RRF_K} + l.lex_rnk), 0.0)
               + COALESCE(1.0 / ({_RRF_K} + d.den_rnk), 0.0) AS rrf
    FROM lex l FULL OUTER JOIN den d ON l.doc_id = d.doc_id
)
SELECT doc_id, lex_rnk, den_rnk, ROUND(rrf, 9) AS rrf_score,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rnk
FROM fused
QUALIFY rnk <= {_FINAL_K}
ORDER BY rnk
"""


def _lex_list(docs: DataFrame) -> DataFrame:
    """(doc_id, lex_rnk): the truncated BM25 ranking. orderBy+limit is
    TakeOrderedAndProject; the rank window then runs over ≤ {_LEX_N}
    rows, so the single-partition window is constant-size by
    construction."""
    top = (
        bm25_scored(docs)
        .filter((F.col("score") > 0) & (F.col("doc_id") != _PROBE_DOC))
        .select("doc_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(_LEX_N)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.select("doc_id", F.row_number().over(w).cast("long").alias("lex_rnk"))


def _den_list(docs: DataFrame) -> DataFrame:
    """(doc_id, den_rnk): truncated cosine ranking of every document's
    hashed vector against the fixed probe document's vector — corpus ×
    broadcast(1 row) on flat codegen columns, then a global top-N."""
    vecs = hashed_doc_vectors(docs).select(
        "doc_id", F.col("embedding").cast("array<double>").alias("e")
    )
    corpus = V.flatten_vec(
        vecs.filter(F.col("doc_id") != _PROBE_DOC).select(
            "doc_id", "e", V.norm(F.col("e")).alias("nb")
        ),
        "e", DIM, "_b", ["doc_id", "nb"],
    )
    probe = V.flatten_vec(
        vecs.filter(F.col("doc_id") == _PROBE_DOC).select(
            "e", V.norm(F.col("e")).alias("na")
        ),
        "e", DIM, "_a", ["na"],
    )
    cos = V.dot_flat("_a", "_b", DIM) / (F.col("na") * F.col("nb"))
    top = (
        corpus.crossJoin(F.broadcast(probe))
        .select("doc_id", F.round(cos, 6).alias("cos6"))
        .orderBy(F.col("cos6").desc(), F.col("doc_id").asc())
        .limit(_DEN_N)
    )
    w = Window.orderBy(F.col("cos6").desc(), F.col("doc_id").asc())
    return top.select("doc_id", F.row_number().over(w).cast("long").alias("den_rnk"))


@register("hybrid_rrf_topk", oracle=_rrf_oracle(), driver=False)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion of the BM25 and hashed-vector rankings (see module
    docstring): top-{_FINAL_K} documents for the fixed query, with each
    ranker's rank and the fused score."""
    docs = read_table(spark, sf_dir, "documents")
    fused = _lex_list(docs).join(_den_list(docs), "doc_id", "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rnk")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("den_rnk")), F.lit(0.0))
    w = Window.orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("rrf", rrf)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _FINAL_K)
        .select(
            "doc_id",
            "lex_rnk",
            "den_rnk",
            F.round("rrf", 9).alias("rrf_score"),
            "rnk",
        )
        .orderBy("rnk")
    )


# ---------------------------------------------------------------------------
# Rerank stage: exact token-set Jaccard over the fused candidates
# ---------------------------------------------------------------------------
#
# The third stage of the standard retrieval stack (retrieve -> fuse ->
# rerank): an expensive exact scorer applied ONLY to the fused top-K.
# The deterministic stand-in for a cross-encoder is exact token-SET
# Jaccard against the probe document — integer arithmetic, so the
# oracle is exact; a learned cross-encoder would slot into the same
# ≤K-rows-per-query seam (broadcast the candidate texts, score in an
# Arrow batch). The scale property is the seam itself: whatever the
# scorer costs, it runs on K rows, not the corpus.


def _rerank_oracle() -> str:
    return f"""
WITH fused_out AS ({_rrf_oracle().strip().rstrip()}
),
tok AS (
    SELECT doc_id, list_distinct(string_split({_NORM_SQL}, ' ')) AS ts
    FROM documents
),
scored AS (
    SELECT f.doc_id, f.rnk AS rrf_rnk,
           CAST(len(list_intersect(t.ts, p.ts)) AS BIGINT) AS n_shared,
           CAST(len(list_distinct(list_concat(t.ts, p.ts))) AS BIGINT) AS n_union
    FROM fused_out f
    JOIN tok t ON t.doc_id = f.doc_id
    JOIN tok p ON p.doc_id = {_PROBE_DOC}
)
SELECT doc_id, rrf_rnk, n_shared, n_union,
       ROUND(CAST(n_shared AS DOUBLE) / n_union, 6) AS jaccard,
       CAST(ROW_NUMBER() OVER (
           ORDER BY CAST(n_shared AS DOUBLE) / n_union DESC, doc_id ASC
       ) AS BIGINT) AS rnk
FROM scored
ORDER BY rnk
"""


_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register("hybrid_rerank_topk", oracle=_rerank_oracle(), driver=False)
def hybrid_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rerank the RRF top-{_FINAL_K} by exact token-set Jaccard against
    the probe document (see the stage comment above). The scorer sees
    {_FINAL_K} rows per query — the rerank seam, not a corpus pass."""
    from pyspark_big_data_spark.queries.embed_hash import normalize_text

    docs = read_table(spark, sf_dir, "documents")
    fused = hybrid_rrf_topk(spark, sf_dir).select("doc_id", F.col("rnk").alias("rrf_rnk"))
    tok = docs.select(
        "doc_id",
        F.array_distinct(F.split(normalize_text(F.col("text")), " ")).alias("ts"),
    )
    probe = tok.filter(F.col("doc_id") == _PROBE_DOC).select(F.col("ts").alias("pts"))
    scored = (
        fused.join(tok, "doc_id")
        .crossJoin(F.broadcast(probe))
        .select(
            "doc_id",
            "rrf_rnk",
            F.size(F.array_intersect("ts", "pts")).cast("long").alias("n_shared"),
            F.size(F.array_distinct(F.concat("ts", "pts"))).cast("long").alias("n_union"),
        )
    )
    jac = F.col("n_shared").cast("double") / F.col("n_union")
    w = Window.orderBy(jac.desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("jaccard", F.round(jac, 6))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .select("doc_id", "rrf_rnk", "n_shared", "n_union", "jaccard", "rnk")
        .orderBy("rnk")
    )
