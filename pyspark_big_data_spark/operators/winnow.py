"""Winnowing document fingerprints (Schleimer-Wilkerson-Aiken, MOSS).

Hash every k-char gram of normalized text, keep the minimum hash of
each window of w consecutive gram hashes, dedupe. Any substring match
of length >= k+w-1 between two documents is guaranteed to contribute a
shared fingerprint — a *partial-overlap* detector (quotation /
boilerplate / plagiarism), complementing MinHash (whole-document set
similarity) and SimHash (distributional similarity).

Shape matters: the pipeline is ROW-oriented — posexplode the k-gram
array once (each md5 computed exactly once), then the window minimum is
a plain window function over (doc, pos). A per-document array
formulation (array-of-hashes + transform over windows) re-evaluates the
hash array inside the window lambda, turning O(len) hashing into
O(len·w) or worse per document; the row form also distributes long
documents across tasks instead of building giant per-row arrays.

The gram hash is portable hash48 (md5 prefix arithmetic), so the DuckDB
oracle (``winnow_rows_sql_duckdb``) replays the identical pipeline —
same grams, same hashes, same window minima — bit-for-bit.

Scale notes: fingerprints-per-doc ~ len/w, so the fingerprint table is
a constant fraction of corpus size; everything after the explode is one
shuffle on doc_id (the window) plus whatever the caller joins on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pyspark_big_data_spark.functions.text import NORMALIZE_SQL, hash48, normalize_text

WINNOW_K = 8  # k-gram length (chars)
WINNOW_W = 4  # window of consecutive k-gram hashes


def winnow_fingerprint_rows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Distinct winnowed fingerprints, one row per (id, fp).

    Documents shorter than k chars contribute no rows (no k-grams);
    documents with fewer than w grams contribute the min over all their
    grams (one window), matching the SQL twin exactly.
    """
    n = normalize_text(F.col(text_col))
    grams = F.expr(
        f"CASE WHEN length(__n) < {k} THEN CAST(array() AS ARRAY<STRING>) "
        f"ELSE transform(sequence(1, length(__n) - {k - 1}), i -> substring(__n, i, {k})) END"
    )
    g = (
        docs.select(F.col(id_col), n.alias("__n"))
        .select(id_col, F.posexplode(grams).alias("pos0", "g"))
        .select(id_col, (F.col("pos0") + 1).alias("pos"), hash48(F.col("g")).alias("h"))
    )
    w_min = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(Window.currentRow, w - 1)
    )
    w_doc = Window.partitionBy(id_col)
    return (
        g.select(
            id_col,
            "pos",
            F.min("h").over(w_min).alias("wmin"),
            F.count(F.lit(1)).over(w_doc).alias("m"),
        )
        .filter(F.col("pos") <= F.greatest(F.col("m") - (w - 1), F.lit(1)))
        .select(F.col(id_col), F.col("wmin").alias("fp"))
        .distinct()
    )


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
