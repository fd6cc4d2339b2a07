"""Inverted-index retrieval queries (operators/inverted_index.py).

The reference engine has no text-retrieval surface (src/query1-4.py:
four crime-analytics queries); these extend the LLM-pipeline suite's
retrieval tier: BM25 (hybrid_retrieval.py) ranks by scan, the inverted
index answers exact conjunctive term lookups from O(posting lists)
instead of O(corpus) — the 100 TB path for "find every document
containing all of these terms".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table, session_tmpdir
from pyspark_big_data_spark.queries.registry import register

_QUERY_TERMS = ["hash", "stream", "vector"]
_N_BUCKETS = 32

# Cross-engine tokenizer contract: lower + split on [^a-z0-9]+, drop
# empties — the same expression pair the corpus text metrics use.
_INV_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, t
    FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
        FROM documents
    )
    WHERE t <> ''
)
SELECT doc_id,
       COUNT(*) AS score,
       CAST(1 AS BIGINT) AS bucket_gate
FROM toks
WHERE t IN ('{"','".join(_QUERY_TERMS)}')
GROUP BY doc_id
HAVING COUNT(DISTINCT t) = {len(_QUERY_TERMS)}
ORDER BY doc_id
"""


@register("inverted_index_search_witness", oracle=_INV_ORACLE, driver=False)
def inverted_index_search_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index conjunctive search driver-verified (r11 queue;
    operators/inverted_index.py): build the bucket-partitioned postings
    index over the documents corpus (one tokenize + groupBy pass,
    hive-partitioned on pmod(xxhash64(term), 32)), then answer "every
    document containing ALL of {hash, stream, vector}" through
    ``search_all_terms`` — which opens ONLY the query terms' bucket
    directories and reduces to a groupBy over their postings, never a
    corpus scan. Emits (doc_id, score = total tf over the query terms)
    plus ``bucket_gate`` = 1 iff the search touched strictly fewer
    buckets than the index total (the partition-pruning contract).
    DuckDB recomputes the conjunction from the raw text with the same
    tokenizer, so a dropped posting, a tf miscount, a term hashed into
    the wrong bucket (its postings would be missing from the opened
    subset), or pruning that silently stopped pruning flips the row
    red."""
    from pyspark_big_data_spark.operators.inverted_index import (
        build_inverted_index,
        search_all_terms,
    )

    root = session_tmpdir("inv_index_")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    build_inverted_index(docs, "doc_id", "text", root, n_buckets=_N_BUCKETS)
    hits, n_touched = search_all_terms(spark, root, _QUERY_TERMS, _N_BUCKETS)
    gate = 1 if n_touched < _N_BUCKETS else 0
    return hits.select(
        "doc_id", "score", F.lit(gate).cast("long").alias("bucket_gate")
    ).orderBy("doc_id")
