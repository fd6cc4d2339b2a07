"""End-to-end training-data selection pipeline over documents:
exact-dedup -> quality filter -> language allowlist -> curated set,
optionally materialized as a partitioned parquet dataset.

This is the composition story for the extension operators: each stage
is one of the already-verified building blocks, chained in a single
declarative plan (Catalyst sees the whole pipeline — filters push down
through the dedup join, column pruning drops text where unused).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.functions import text as TX
from pyspark_big_data_spark.io import read_table, write_parquet
from pyspark_big_data_spark.queries.registry import register

_MIN_WORDS = 30
_MAX_PUNCT = 0.10
_LANGS = ("en", "de", "es", "fr", "zh")

_ORACLE = f"""
WITH fp AS (
    SELECT doc_id, lang, source, n_chars,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))
               AS n_words,
           CAST(length(text) - length(regexp_replace(text, '{TX.PUNCT_CLASS}', '', 'g'))
                AS DOUBLE) / greatest(length(text), 1) AS pratio
    FROM documents
), survivors AS (
    SELECT fp, MIN(doc_id) AS keep_doc_id FROM fp GROUP BY fp
)
SELECT f.doc_id, f.lang, f.source, CAST(f.n_words AS BIGINT) AS n_words
FROM fp f
JOIN survivors s ON s.keep_doc_id = f.doc_id AND s.fp = f.fp
WHERE f.n_words >= {_MIN_WORDS}
  AND f.pratio <= {_MAX_PUNCT}
  AND f.lang IN ({", ".join(f"'{lang}'" for lang in _LANGS)})
ORDER BY doc_id
"""


def curated_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    enriched = docs.select(
        "doc_id",
        "lang",
        "source",
        TX.fingerprint(F.col("text")).alias("fp"),
        TX.word_count(F.col("text")).cast("long").alias("n_words"),
        TX.punct_ratio(F.col("text")).alias("pratio"),
    )
    survivors = enriched.groupBy("fp").agg(F.min("doc_id").alias("keep_doc_id"))
    return (
        enriched.join(
            survivors,
            (enriched["doc_id"] == survivors["keep_doc_id"]) & (enriched["fp"] == survivors["fp"]),
            "inner",
        )
        .filter(
            (F.col("n_words") >= _MIN_WORDS)
            & (F.col("pratio") <= _MAX_PUNCT)
            & F.col("lang").isin(*_LANGS)
        )
        .select("doc_id", "lang", "source", "n_words")
        .orderBy("doc_id")
    )


@register("training_set_select", oracle=_ORACLE)
def training_set_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curated_training_set(spark, sf_dir)


def materialize_training_set(spark: SparkSession, sf_dir: str, out_path: str) -> int:
    """Write the curated set partitioned by lang (partition-pruned reads
    downstream); returns the row count written."""
    curated = curated_training_set(spark, sf_dir)
    write_parquet(curated, out_path, partition_by=["lang"])
    return spark.read.parquet(out_path).count()
