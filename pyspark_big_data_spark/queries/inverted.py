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


# ---------------------------------------------------------------------------
# Phrase search over a positional index
# ---------------------------------------------------------------------------

_PHRASE = ["stream", "column"]

# Exact positional oracle: DuckDB replays the normalized-whitespace
# token stream (the shared functions/text.py::tokens contract) with
# generate_subscripts positions and chains adjacency joins.
_PHRASE_ORACLE = f"""
WITH d AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
    FROM documents
),
toks AS (
    SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i
    FROM d
)
SELECT a.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(1 AS BIGINT) AS bucket_gate
FROM toks a
JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
WHERE a.t = '{_PHRASE[0]}' AND b.t = '{_PHRASE[1]}'
GROUP BY a.doc_id
ORDER BY a.doc_id
"""


@register("phrase_search_witness", oracle=_PHRASE_ORACLE, driver=False)
def phrase_search_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search driver-verified (r11 queue;
    operators/inverted_index.py): build the postings index WITH
    per-posting sorted position lists (the normalized-whitespace
    tokenizer shared with BM25, functions/text.py::tokens), then find
    every document containing the exact phrase "{stream column}" by
    intersecting the two terms' position lists per doc — a join of two
    posting lists plus one JVM-side array fold, reading only the
    phrase terms' buckets (``bucket_gate``). Emits (doc_id,
    n_occurrences). DuckDB recomputes positions independently with
    generate_subscripts and chains an adjacency self-join, so a
    position list collected out of order, an off-by-one in the shift,
    or a posting routed to the wrong bucket flips the row red."""
    from pyspark_big_data_spark.functions import text as TX
    from pyspark_big_data_spark.operators.inverted_index import (
        build_inverted_index,
        phrase_search,
    )

    root = session_tmpdir("inv_pos_")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    build_inverted_index(
        docs, "doc_id", "text", root,
        n_buckets=_N_BUCKETS, tokens_fn=TX.tokens, positions=True,
    )
    hits, n_touched = phrase_search(spark, root, _PHRASE, _N_BUCKETS)
    gate = 1 if n_touched < _N_BUCKETS else 0
    return hits.select(
        "doc_id",
        "n_occurrences",
        F.lit(gate).cast("long").alias("bucket_gate"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# BM25 ranking served FROM the index (no corpus scan at query time)
# ---------------------------------------------------------------------------


def _bm25_index_oracle() -> str:
    from pyspark_big_data_spark.queries.corpus_ops import (
        BM25_TERMS,
        BM25_TOPK,
        bm25_scored_cte,
    )

    tf_out = ", ".join(f"tf_{t}" for t in BM25_TERMS)
    return f"""
{bm25_scored_cte()}
SELECT doc_id, dl, {tf_out}, score
FROM scored
WHERE score > 0
ORDER BY score DESC, doc_id
LIMIT {BM25_TOPK}
"""


@register("bm25_from_index_topk", oracle=_bm25_index_oracle(), driver=False)
def bm25_from_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k served FROM the inverted index (r11 queue): build the
    index with the ``doclen`` sidecar once, then rank WITHOUT touching
    the corpus — tf per query term from the terms' posting lists (only
    their buckets are opened), df per term by counting those same
    lists, and (n_docs, sum_dl, per-doc dl) from the slim doclen
    sidecar. The score expression replays queries/corpus_ops.py::
    bm25_scored term-for-term in the same left-to-right order over the
    same integer inputs, so the doubles are IEEE-identical to the
    scan-based ranker and the shared oracle
    (corpus_ops.bm25_scored_cte) stays bit-exact. At 100 TB this is
    the difference between re-scanning the corpus per query and
    reading O(query posting lists) + a docs-cardinality sidecar —
    the reason engines index at all."""
    from pyspark_big_data_spark.functions import text as TX
    from pyspark_big_data_spark.queries.corpus_ops import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        BM25_TOPK,
    )
    from pyspark_big_data_spark.operators.inverted_index import (
        build_inverted_index,
        read_doclen,
        read_term_postings,
    )

    root = session_tmpdir("inv_bm25_")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    build_inverted_index(
        docs, "doc_id", "text", root,
        n_buckets=_N_BUCKETS, tokens_fn=TX.tokens, with_doclen=True,
    )

    postings, _ = read_term_postings(spark, root, list(BM25_TERMS), _N_BUCKETS)
    if postings is None:  # no query-term bucket exists: nothing can score > 0
        tf_schema = ", ".join(f"tf_{t} long" for t in BM25_TERMS)
        return spark.createDataFrame(
            [], f"doc_id long, dl long, {tf_schema}, score double"
        )
    # tf pivot over the query terms (docs with >= 1 query term — every
    # other doc scores exactly 0 and is excluded by the oracle's
    # score > 0 guard)
    tf = postings.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("tf")).otherwise(0))
            .cast("long")
            .alias(f"tf_{t}")
            for t in BM25_TERMS
        ]
    )
    # df per term = that term's posting-list length (rows are per-doc)
    df_row = postings.agg(
        *[
            F.coalesce(
                F.sum((F.col("term") == t).cast("long")), F.lit(0)
            ).alias(f"df_{t}")
            for t in BM25_TERMS
        ]
    )
    doclen = read_doclen(spark, root)
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    # scalar attaches: two 1-row corpus-stat frames (same shape as
    # bm25_scored's allowlisted broadcast)
    joined = (
        tf.join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(df_row))
    )

    def d(c) -> F.Column:
        return F.col(c).cast("double")

    terms_score = []
    for t in BM25_TERMS:
        idf = F.log(
            F.lit(1.0)
            + (d("n_docs") - d(f"df_{t}") + F.lit(0.5)) / (d(f"df_{t}") + F.lit(0.5))
        )
        dlnorm = d("dl") * d("n_docs") / d("sum_dl")
        tfc = (d(f"tf_{t}") * F.lit(BM25_K1 + 1.0)) / (
            d(f"tf_{t}")
            + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dlnorm)
        )
        terms_score.append(idf * tfc)
    score = terms_score[0] + terms_score[1] + terms_score[2]
    return (
        joined.select(
            "doc_id",
            "dl",
            *[F.col(f"tf_{t}") for t in BM25_TERMS],
            F.round(score, 6).alias("score"),
        )
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), "doc_id")
        .limit(BM25_TOPK)
    )
