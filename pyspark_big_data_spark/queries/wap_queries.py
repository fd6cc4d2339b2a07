"""Write-audit-publish witness (operators/expectations.py::
audited_publish + operators/versioned.py's audit hook).

Publishes a clean customer snapshot through its expectation suite,
then attempts to publish a PLANTED-DIRTY frame (null keys, duplicated
keys, an out-of-bounds balance) through the SAME suite — the second
commit must be refused with nothing published and no staging debris.
The row value-pins the surviving snapshot against DuckDB reading
customer directly, plus three gates: publish_gate (clean commit landed
as v0 and the suite's report was all-pass), abort_gate (the dirty
commit raised AuditFailed and latest is STILL v0 — the version counter
must not advance on refusal), and clean_gate (no staging dir left
behind). A WAP that publishes dirty data, half-publishes, or leaks
staging bytes flips a gate; a corrupted clean snapshot flips values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table, session_tmpdir
from pyspark_big_data_spark.queries.registry import register

_ORACLE = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS DOUBLE) AS bal_sum,
       1 AS publish_gate, 1 AS abort_gate, 1 AS clean_gate
FROM customer
"""

_SUITE_COLS = ["c_custkey", "c_acctbal"]


def _suite():
    return [
        ("not_null", "c_custkey", "key_not_null"),
        ("unique", "c_custkey", "key_unique"),
        ("bounds", "c_acctbal", -100000.0, 100000.0, "bal_bounds"),
        ("row_count_min", 1, "nonempty"),
    ]


@register("wap_publish_witness", oracle=_ORACLE, driver=False)
def wap_publish_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAP: clean publishes, dirty is refused with nothing published."""
    from pyspark_big_data_spark.functions.aggregates import dsum
    from pyspark_big_data_spark.operators.expectations import audited_publish
    from pyspark_big_data_spark.operators.versioned import (
        AuditFailed,
        latest_version,
        read_version,
    )

    root = session_tmpdir("wap_dim_")
    clean = read_table(spark, sf_dir, "customer").select(*_SUITE_COLS)

    n, report = audited_publish(clean, root, _suite())
    publish_gate = 1 if (n == 0 and all(r["passed"] for r in report)) else 0

    # planted-dirty: null keys, duplicate keys, an out-of-bounds balance
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(None, 1.0), (1, 999999.0), (1, 2.0)],
            "c_custkey long, c_acctbal double",
        )
    )
    abort_gate = 0
    try:
        audited_publish(dirty, root, _suite())
    except AuditFailed:
        abort_gate = 1 if latest_version(spark, root) == 0 else 0

    # no staging debris may survive a refusal
    import os

    leftovers = [d for d in os.listdir(root) if d.startswith(".staging_")]
    clean_gate = 1 if not leftovers else 0

    return read_version(spark, root, 0).agg(
        F.count(F.lit(1)).alias("n_rows"), dsum("c_acctbal", "bal_sum")
    ).select(
        "n_rows",
        "bal_sum",
        F.lit(publish_gate).alias("publish_gate"),
        F.lit(abort_gate).alias("abort_gate"),
        F.lit(clean_gate).alias("clean_gate"),
    )
