"""Inverted text index: bucket-partitioned postings for term lookups.

The classic IR structure re-expressed as a Spark layout decision: the
postings relation ``(term, doc_id, tf)`` is hive-partitioned by
``bucket = pmod(xxhash64(term), n_buckets)`` and sorted by
``(term, doc_id)`` within files. A conjunctive (AND) term query then

- touches ONLY its terms' bucket directories (partition pruning by
  construction — the read never lists the other buckets' files),
- pushes ``term IN (...)`` into the parquet scan, where the
  within-file term ordering makes row-group min/max stats selective,
- reduces to one partial-aggregated groupBy over the few matching
  postings rows — never a scan of the corpus text.

At 100 TB the economics are the point: the index build is one
tokenize + groupBy pass (shuffled once on (term, doc_id), map-side
combined), and every subsequent query reads O(sum of the query terms'
posting lists) instead of O(corpus). Buckets bound the file-listing
fan-out the way a real search engine shards its dictionary; skewed
(stop-word) terms spread within their bucket's files but never
concentrate a shuffle, because queries aggregate by doc_id, not term.
Tokenization is the repo's cross-engine contract: lowercase +
``[^a-z0-9]+`` split, the exact expression DuckDB replays in the
oracle (queries/inverted.py).

Reference parity note: the reference engine (src/query1-4.py) has no
text-retrieval surface; this extends the LLM-pipeline suite alongside
BM25 (queries/hybrid_retrieval.py), which ranks a full scan — the
index is the scale path for exact term lookups.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize_terms(df: DataFrame, doc_id_col: str, text_col: str) -> DataFrame:
    """``(doc_id, term)`` token stream: lowercase, alnum-run tokens.
    One row per token OCCURRENCE (duplicates feed tf counts)."""
    return (
        df.select(
            F.col(doc_id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def build_inverted_index(
    df: DataFrame,
    doc_id_col: str,
    text_col: str,
    out_root: str,
    n_buckets: int = 32,
) -> None:
    """Materialize the postings index at ``out_root``.

    Layout: ``out_root/bucket=B/*.parquet`` rows ``(term, doc_id, tf)``,
    sorted by (term, doc_id) within partitions so parquet row-group
    stats prune within a bucket too. One shuffle total (the groupBy;
    the repartition on bucket rides the same exchange count but moves
    already-aggregated postings, which are corpus-sublinear)."""
    postings = (
        tokenize_terms(df, doc_id_col, text_col)
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
    )
    (
        postings.repartition("bucket")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_root)
    )


def term_buckets(
    spark: SparkSession, terms: list[str], n_buckets: int
) -> dict[str, int]:
    """Bucket id per query term — the same JVM xxhash64 the build used,
    evaluated on a |terms|-row local frame (bounded driver collect)."""
    df = spark.createDataFrame([(t,) for t in terms], "term string").select(
        "term", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("bucket")
    )
    return {r["term"]: int(r["bucket"]) for r in df.collect()}


def search_all_terms(
    spark: SparkSession,
    index_root: str,
    terms: list[str],
    n_buckets: int,
) -> tuple[DataFrame, int]:
    """Conjunctive search: docs containing EVERY term in ``terms``,
    scored by total tf over the query terms. Returns ``(df, n_buckets_
    touched)``; the frame has columns ``(doc_id, score)``.

    Only the query terms' bucket directories are opened — the second
    element lets callers assert the pruning actually happened. Terms
    are deduplicated; an unknown term yields an empty result (it can
    match no document), caught cheaply because its bucket's postings
    simply contain no such term."""
    qterms = sorted(set(terms))
    if not qterms:
        raise ValueError("search needs at least one term")
    buckets = sorted(set(term_buckets(spark, qterms, n_buckets).values()))
    parts = [
        spark.read.parquet(f"{index_root.rstrip('/')}/bucket={b}") for b in buckets
    ]
    postings = reduce(DataFrame.unionByName, parts)
    hits = (
        postings.filter(F.col("term").isin(qterms))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("_nt"),
            F.sum("tf").alias("score"),
        )
        .filter(F.col("_nt") == len(qterms))
        .select("doc_id", F.col("score").cast("long").alias("score"))
    )
    return hits, len(buckets)
