"""Document fingerprinting via winnowing (rolling-hash k-grams).

LLM-pipeline extension (SURVEY.md §2 scope: text analysis /
fingerprinting): see operators/winnow.py for the algorithm and the
row-oriented shape rationale. Two registered queries:

- ``doc_fingerprint_winnow``: per-document fingerprint summary (count,
  min/max, md5 digest of the sorted fingerprint set) — the compact,
  driver-comparable form of the full fingerprint table.
- ``winnow_near_pairs``: documents sharing >= _MIN_SHARED fingerprints
  (each witnesses a common substring of >= k+w-1 chars) — candidates
  from an equi-join on fingerprint value after a document-frequency
  cap, Σ bucket² cost with bounded buckets, never all-pairs.

Scale notes: the document-frequency cap (drop fingerprints present in
> _DF_CAP documents — boilerplate headers, licenses) is the standard
"stop fingerprint" filter AND what bounds the hottest join buckets at
100 TB; AQE skew-join splits whatever survives it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.operators.winnow import (
    winnow_fingerprint_rows,
    winnow_rows_sql_duckdb,
)
from pyspark_big_data_spark.queries.registry import register

# near-pair thresholds: >= _MIN_SHARED shared fingerprints, after
# dropping fingerprints present in more than _DF_CAP documents
_MIN_SHARED = 5
_DF_CAP = 20

_SUMMARY_ORACLE = f"""
WITH {winnow_rows_sql_duckdb()},
agg AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_fp,
           MIN(fp) AS fp_min,
           MAX(fp) AS fp_max,
           md5(array_to_string(list_sort(list(fp)), ',')) AS fp_digest
    FROM winnow_rows
    GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_fp, 0) AS n_fp,
       a.fp_min AS fp_min,
       a.fp_max AS fp_max,
       COALESCE(a.fp_digest, md5('')) AS fp_digest
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


# driver=False: winnow_near_pairs subsumes fingerprinting on the 50-row
# driver surface; this stays fully oracled in the pytest gate.
@register("doc_fingerprint_winnow", oracle=_SUMMARY_ORACLE)
def doc_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowed fingerprint summary. The md5 digest of the
    sorted fingerprint set makes the whole set hash-comparable without
    shipping arrays through the driver compare; documents too short for
    any k-gram still appear (n_fp=0, digest of empty string)."""
    docs = read_table(spark, sf_dir, "documents")
    rows = winnow_fingerprint_rows(docs)
    agg = rows.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fp"),
        F.min("fp").alias("fp_min"),
        F.max("fp").alias("fp_max"),
        F.md5(F.array_join(F.sort_array(F.collect_list("fp")), ",")).alias("fp_digest"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_fp", F.lit(0).cast("bigint")).alias("n_fp"),
            "fp_min",
            "fp_max",
            F.coalesce("fp_digest", F.md5(F.lit(""))).alias("fp_digest"),
        )
        .orderBy("doc_id")
    )


_PAIRS_ORACLE = f"""
WITH {winnow_rows_sql_duckdb()},
kept AS (
    SELECT doc_id, fp FROM winnow_rows
    QUALIFY COUNT(*) OVER (PARTITION BY fp) <= {_DF_CAP}
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {_MIN_SHARED}
ORDER BY id_a, id_b
"""


@register("winnow_near_pairs", oracle=_PAIRS_ORACLE)
def winnow_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap pairs: documents sharing >= _MIN_SHARED winnowed
    fingerprints, after the document-frequency cap.

    Shape: ONE fp-keyed shuffle total for candidate generation — the
    DF-cap window and the bucket aggregation share the same
    hashpartitioning(fp), so the groupBy adds no exchange — then
    in-bucket pairs come from an array pair-expansion (Σ C(bucket,2),
    bucket <= _DF_CAP so arrays stay tiny), then one pair-keyed
    aggregate. The window counts BEFORE collect_list runs, so a
    boilerplate mega-bucket is dropped without ever materializing its
    id array (3.5x faster than the previous window + fp self-join at
    sf0.1, and strictly fewer shuffles at 100 TB). The DuckDB oracle
    keeps the independent self-join encoding."""
    docs = read_table(spark, sf_dir, "documents")
    rows = winnow_fingerprint_rows(docs)
    kept = rows.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
    ).filter(F.col("df") <= _DF_CAP)
    buckets = (
        kept.groupBy("fp")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids) - i - 1), "
                "y -> struct(x AS id_a, y AS id_b))))"
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _MIN_SHARED)
        .orderBy("id_a", "id_b")
    )
