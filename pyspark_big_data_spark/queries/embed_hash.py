"""Feature-hashing document embedder: deterministic token-hash vectors
that connect the text pipeline to the vector pipeline without a model.

The classic hashing trick (Weinberger et al., feature hashing): each
token hashes to one of DIM buckets with a ±1 sign drawn from the same
hash; a document's vector is the signed bucket-count array. Cosine over
these vectors approximates token-multiset similarity — the embedding
near-dup / ANN operators can then run over raw text corpora that ship
no model embeddings. Everything is integer arithmetic on the portable
md5 hash48, so the DuckDB oracle replays it EXACTLY (no float drift).

Scale design: the embed stage is one map-side explode + ONE shuffle
keyed by doc_id (the 64 signed sums are conditional partial aggregates,
the same HashAggregate shape as the MinHash signature stage) — at
100 TB it runs at scan speed. The all-pairs cosine query below is the
guarded exactness witness; the scale path feeds these vectors into the
bucketed tiers (ann_lsh_bucketed / ann_topk_ivf_np), which accept any
array column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.functions.text import hash48, hash48_sql_duckdb, normalize_text
from pyspark_big_data_spark.io import ensure_min_partitions, read_table
from pyspark_big_data_spark.queries.registry import register

DIM = 64
_NEAR_COS = 0.60

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def hashed_doc_vectors(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", dim: int = DIM
) -> DataFrame:
    """(id, embedding array<long>): signed token-hash bucket counts.

    bucket = hash48(tok) % dim; sign = +1 when the next hash bit is 0.
    Duplicated tokens accumulate — the vector is the signed multiset
    projection, so cosine tracks token-frequency overlap.
    """
    norm = normalize_text(F.col(text_col))
    toks = ensure_min_partitions(df.select(F.col(id_col), norm.alias("n"))).select(
        id_col, F.explode(F.split(F.col("n"), " ")).alias("tok")
    )
    h = toks.select(id_col, hash48(F.col("tok")).alias("h"))
    sgn = F.when((F.col("h") / dim).cast("long") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    b = h.select(id_col, (F.col("h") % dim).alias("bucket"), sgn.alias("sgn"))
    aggs = [
        F.coalesce(F.sum(F.when(F.col("bucket") == i, F.col("sgn"))), F.lit(0)).alias(f"v{i}")
        for i in range(dim)
    ]
    sums = b.groupBy(id_col).agg(*aggs)  # one shuffle, map-side partials
    return sums.select(
        id_col, F.array(*[F.col(f"v{i}").cast("long") for i in range(dim)]).alias("embedding")
    )


def _dd_embed_cte(dim: int = DIM) -> str:
    """DuckDB replay of hashed_doc_vectors: same normalize, same hash48,
    same bucket/sign arithmetic, same conditional integer sums."""
    h = hash48_sql_duckdb("tok")
    sums = ", ".join(
        f"COALESCE(SUM(CASE WHEN bucket = {i} THEN sgn END), 0) AS v{i}" for i in range(dim)
    )
    vlist = ", ".join(f"v{i}" for i in range(dim))
    return f"""
WITH d AS (SELECT doc_id, {_NORM} AS norm FROM documents),
tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS tok FROM d),
hb AS (
    SELECT doc_id, {h} % {dim} AS bucket,
           CASE WHEN ({h} // {dim}) % 2 = 0 THEN 1 ELSE -1 END AS sgn
    FROM tok
),
sums AS (SELECT doc_id, {sums} FROM hb GROUP BY doc_id),
vecs AS (SELECT doc_id, [{vlist}] AS e FROM sums)"""


_EMBED_ORACLE = f"""{_dd_embed_cte()}
SELECT doc_id, e AS embedding FROM vecs ORDER BY doc_id
"""


@register("doc_embed_hash", oracle=_EMBED_ORACLE, driver=False)
def doc_embed_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed {DIM}-dim document vectors for the whole corpus — integer
    arithmetic end to end, so Spark and DuckDB agree bit-for-bit."""
    return hashed_doc_vectors(read_table(spark, sf_dir, "documents")).orderBy("doc_id")


_DD_COS = (
    "list_dot_product(a.e, b.e) / "
    "(sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))"
)

_NEAR_ORACLE = f"""{_dd_embed_cte()},
dv AS (SELECT doc_id, CAST(e AS DOUBLE[]) AS e FROM vecs)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, ROUND({_DD_COS}, 6) AS cosine
FROM dv a JOIN dv b ON a.doc_id < b.doc_id
WHERE {_DD_COS} >= {_NEAR_COS}
ORDER BY id_a, id_b
"""


@register("doc_embed_near_dup", oracle=_NEAR_ORACLE, driver=False)
def doc_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup over GENERATED text vectors (no model,
    no embeddings table): hash-embed the corpus, exact cosine pairs at
    ≥ {_NEAR_COS}. All-pairs guarded — the exactness witness; at scale
    the same vectors flow into the bucketed ANN tiers instead."""
    from pyspark_big_data_spark.functions import vectors as V
    from pyspark_big_data_spark.queries.similarity import guard_allpairs

    emb = guard_allpairs(
        hashed_doc_vectors(read_table(spark, sf_dir, "documents")).select(
            "doc_id", F.col("embedding").cast("array<double>").alias("e")
        ),
        "doc_embed_near_dup",
    )
    a = emb.select(F.col("doc_id").alias("id_a"), F.col("e").alias("ea"))
    b = emb.select(F.col("doc_id").alias("id_b"), F.col("e").alias("eb"))
    cos: Column = V.cosine(F.col("ea"), F.col("eb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= _NEAR_COS)
        .select("id_a", "id_b", F.round("cos", 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )
