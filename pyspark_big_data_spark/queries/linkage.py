"""Fuzzy record linkage: blocked edit-distance matching over a
deduplicated name vocabulary.

The entity-resolution staple the near-dup stack doesn't cover: SHORT
string keys (names, titles, SKUs) where character-level edit distance —
not shingle overlap — is the right similarity. The production recipe at
100 TB is the one implemented here:

1. **Project to the distinct vocabulary first.** Real catalogs repeat
   names massively (this testdata: 2 000 parts share 64 distinct
   names); linking the vocabulary instead of the rows turns an
   O(rows²)-flavored problem into O(|vocab| within blocks), and the
   final explode-back is a cheap equi-join on name.
2. **Block, never all-pairs.** Candidate pairs come from an equi-join
   on a blocking key (here the head noun of the name — in general a
   phonetic code / sorted-token prefix). The bill is Σ block², the
   same guarantee as the LSH band joins in operators/dedup.py.
3. **Verify with a JVM builtin.** ``F.levenshtein`` runs inside
   whole-stage codegen; no Python touches the hot path.

DuckDB's ``levenshtein`` implements the same unit-cost dynamic program,
so the oracle is integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_MAX_DIST = 3  # unit-cost Levenshtein acceptance threshold

_FUZZY_ORACLE = f"""
WITH vocab AS (
    SELECT p_name, split_part(p_name, ' ', -1) AS blk, COUNT(*) AS n_parts
    FROM part GROUP BY 1, 2
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM vocab a JOIN vocab b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}
ORDER BY name_a, name_b
"""


@register("fuzzy_name_links", oracle=_FUZZY_ORACLE)
def fuzzy_name_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part-name pairs: distinct-vocabulary projection,
    head-noun blocking, codegen Levenshtein verify (<= {_MAX_DIST}).
    Each side carries its row multiplicity so consumers can explode the
    vocabulary-level links back to row-level matches without touching
    the base table again."""
    vocab = (
        read_table(spark, sf_dir, "part")
        .groupBy("p_name", F.element_at(F.split("p_name", " "), -1).alias("blk"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    a = vocab.select(
        F.col("p_name").alias("name_a"), "blk", F.col("n_parts").alias("n_parts_a")
    )
    b = vocab.select(
        F.col("p_name").alias("name_b"), "blk", F.col("n_parts").alias("n_parts_b")
    )
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= _MAX_DIST)
        .select("name_a", "name_b", "dist", "n_parts_a", "n_parts_b")
        .orderBy("name_a", "name_b")
    )
