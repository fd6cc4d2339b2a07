"""Tag-protected retention witness (operators/refs.py).

Commits a 3-version customer history, pins v1 under a release tag,
then vacuums with keep_last=1. Correct behavior: v0 (untagged, old)
is reclaimed, v1 SURVIVES because the tag protects it, v2 survives as
the newest — and time travel by NAME still answers from v1's bytes.
The row emits (which, n_rows, bal_sum, gates) for the tag-read v1 and
the latest v2, with DuckDB recomputing both derivations as layered
CTEs; gates pin that v0 really expired (reading it raises) and that
exactly [0] was reclaimed. A vacuum that ignores tags, a tag that
resolves to the wrong version, or an expire that ate the newest
snapshot flips values or gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table, session_tmpdir
from pyspark_big_data_spark.queries.registry import register

_ORACLE = """
WITH v0 AS (
    SELECT c_custkey, c_acctbal FROM customer
), v1 AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
    FROM v0
), v2 AS (
    SELECT * FROM v1 WHERE c_custkey % 4 <> 1
)
SELECT 'release_tag_v1' AS which,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS DOUBLE) AS bal_sum,
       1 AS expired_gate, 1 AS protected_gate
FROM v1
UNION ALL
SELECT 'latest_v2',
       COUNT(*),
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS DOUBLE),
       1, 1
FROM v2
ORDER BY which
"""


@register("snapshot_tag_protected_witness", oracle=_ORACLE, driver=False)
def snapshot_tag_protected_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag pins a snapshot through the vacuum; read-by-name value pin."""
    from pyspark_big_data_spark.functions.aggregates import dsum
    from pyspark_big_data_spark.operators.refs import create_tag, read_by_tag
    from pyspark_big_data_spark.operators.versioned import (
        expire_versions,
        read_version,
        write_version,
    )

    root = session_tmpdir("tagged_dim_")
    v0 = read_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    n0 = write_version(v0, root)
    if n0 != 0:
        raise RuntimeError(f"expected v0, committed v={n0}")

    v1 = read_version(spark, root, 0).withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 100.0).otherwise(
            F.col("c_acctbal")
        ),
    )
    n1 = write_version(v1, root)
    v2 = read_version(spark, root, n1).filter(F.col("c_custkey") % 4 != 1)
    write_version(v2, root)

    create_tag(spark, root, "release", n1, note="corpus release pin")
    expired = expire_versions(spark, root, keep_last=1)
    expired_gate = 1 if expired == [0] else 0
    try:  # expired time travel must fail loudly, never read as empty
        read_version(spark, root, 0)
        expired_gate = 0
    except ValueError:
        pass

    from pyspark_big_data_spark.operators.refs import read_tag
    from pyspark_big_data_spark.operators.versioned import list_versions

    tagged = read_by_tag(spark, root, "release")
    latest = read_version(spark, root)
    protected_gate = (
        1 if (n1 in list_versions(spark, root) and read_tag(spark, root, "release") == n1) else 0
    )

    def _stats(df: DataFrame, which: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"), dsum("c_acctbal", "bal_sum")
        ).select(
            F.lit(which).alias("which"),
            "n_rows",
            "bal_sum",
            F.lit(expired_gate).alias("expired_gate"),
            F.lit(protected_gate).alias("protected_gate"),
        )

    return (
        _stats(tagged, "release_tag_v1")
        .unionByName(_stats(latest, "latest_v2"))
        .orderBy("which")
    )
