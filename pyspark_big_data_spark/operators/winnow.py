"""Winnowing document fingerprints (Schleimer-Wilkerson-Aiken, MOSS).

Hash every k-char gram of normalized text, keep the minimum hash of
each window of w consecutive gram hashes, dedupe. Any substring match
of length >= k+w-1 between two documents is guaranteed to contribute a
shared fingerprint — a *partial-overlap* detector (quotation /
boilerplate / plagiarism), complementing MinHash (whole-document set
similarity) and SimHash (distributional similarity).

Shape matters: the pipeline is ARRAY-oriented — the hash array is
materialized ONCE per document in its own projection (each md5 computed
exactly once; verified by timing, not assumed), the sliding minima are
`array_min(slice(...))` over that array, and only the final deduped
fingerprints explode to rows. This is entirely map-side: zero shuffles
until the caller keys by fp — at 100 TB that saves shuffling one row
per CHARACTER of corpus (the previous row-oriented form needed a
(doc, pos) window shuffle of all gram hashes, measured ~40% slower at
sf0.1). Trade-off: per-doc arrays are O(doc length) in memory; for
corpora with multi-MB single documents, re-chunk upstream first.

The gram hash is portable hash48 (md5 prefix arithmetic), so the DuckDB
oracle (``winnow_rows_sql_duckdb``) replays the same semantics with an
INDEPENDENT encoding (row-oriented window minima) — same grams, same
hashes, same fingerprints, different algorithmic shape: exactly what a
differential witness should be.

Scale notes: fingerprints-per-doc ~ len/w, so the fingerprint table is
a constant fraction of corpus size; the fp-keyed aggregation downstream
is the pipeline's only shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pyspark_big_data_spark.functions.text import NORMALIZE_SQL, normalize_text
from pyspark_big_data_spark.io import ensure_min_partitions

WINNOW_K = 8  # k-gram length (chars)
WINNOW_W = 4  # window of consecutive k-gram hashes


def winnow_fingerprint_rows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Distinct winnowed fingerprints, one row per (id, fp). Map-side
    only — no shuffle.

    Documents shorter than k chars contribute no rows (no k-grams);
    documents with fewer than w grams contribute the min over all their
    grams (one window), matching the SQL twin exactly.
    """
    hash_i = f"CAST(conv(substr(md5(substring(__n, i, {k})), 1, 12), 16, 10) AS BIGINT)"
    n = normalize_text(F.col(text_col))
    # __h in its OWN projection: the md5 of each gram is computed once,
    # not once per window that slices it
    # single-file inputs arrive as 1-4 partitions; being shuffle-free,
    # nothing downstream would spread the per-char hash work either —
    # fan out up front (no-op on real multi-file inputs)
    hashed = ensure_min_partitions(docs.select(F.col(id_col), n.alias("__n"))).select(
        id_col,
        F.expr(
            f"CASE WHEN length(__n) < {k} THEN CAST(array() AS ARRAY<BIGINT>) "
            f"ELSE transform(sequence(1, length(__n) - {k - 1}), i -> {hash_i}) END"
        ).alias("__h"),
    )
    fps = F.expr(
        f"CASE WHEN size(__h) = 0 THEN CAST(array() AS ARRAY<BIGINT>) "
        f"WHEN size(__h) < {w} THEN array(array_min(__h)) "
        f"ELSE array_distinct(transform(sequence(1, size(__h) - {w - 1}),"
        f"                              i -> array_min(slice(__h, i, {w})))) END"
    )
    return hashed.select(F.col(id_col), F.explode(fps).alias("fp"))


def winnow_rows_sql_duckdb(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> str:
    """DuckDB CTE chain producing the same ({id_col}, fp) rows."""
    n = NORMALIZE_SQL.format(expr=text_col)
    return f"""
nrm AS (
    SELECT {id_col}, {n} AS n FROM {table}
), g AS (
    SELECT {id_col},
           unnest(generate_series(1, length(n) - {k - 1})) AS pos,
           n
    FROM nrm WHERE length(n) >= {k}
), h AS (
    SELECT {id_col}, pos,
           ('0x' || substr(md5(substr(n, pos, {k})), 1, 12))::BIGINT AS h
    FROM g
), wm AS (
    SELECT {id_col}, pos,
           MIN(h) OVER (PARTITION BY {id_col} ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS wmin,
           COUNT(*) OVER (PARTITION BY {id_col}) AS m
    FROM h
), winnow_rows AS (
    SELECT DISTINCT {id_col}, wmin AS fp
    FROM wm WHERE pos <= greatest(m - {w - 1}, 1)
)"""
