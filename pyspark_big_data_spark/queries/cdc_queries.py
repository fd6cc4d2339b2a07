"""CDC apply-changes witness (operators/cdc.py).

Builds a customer snapshot, folds a deterministic OUT-OF-ORDER change
log into it — updates superseded by later updates, deletes, a
delete-then-resurrect, an update-then-delete, and brand-new inserts —
then returns the ENTIRE resulting table. DuckDB replays the same log
with a row_number()-over-seq-desc resolution applied via anti-join +
union, so a winner picked by arrival order instead of sequence, a
tombstone that failed to delete, a resurrection lost under its own
earlier delete, or an insert dropped by the anti-join flips the row
red. Arrival order is deliberately scrambled relative to sequence
order (the union below interleaves late events first) — the fold must
not care.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table, session_tmpdir
from pyspark_big_data_spark.queries.registry import register

_ORACLE = """
WITH base AS (
    SELECT c_custkey, c_name, c_acctbal FROM customer
), log AS (
    SELECT c_custkey AS k, 10 AS seq, 'u' AS op, c_name AS name, c_acctbal + 100.0 AS bal
    FROM customer WHERE c_custkey % 5 = 0
    UNION ALL
    SELECT c_custkey, 20, 'u', c_name, c_acctbal + 200.0
    FROM customer WHERE c_custkey % 15 = 0
    UNION ALL
    SELECT c_custkey, 30, 'd', NULL, NULL FROM customer WHERE c_custkey % 7 = 1
    UNION ALL
    SELECT c_custkey, 40, 'u', 'resurrected', 50.0 FROM customer WHERE c_custkey % 14 = 1
    UNION ALL
    SELECT c_custkey, 50, 'd', NULL, NULL FROM customer WHERE c_custkey % 13 = 2
    UNION ALL
    SELECT -(c_custkey + 1), 10, 'u', 'inserted', 1.0 FROM customer WHERE c_custkey % 11 = 0
), ranked AS (
    SELECT k, op, name, bal,
           ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
    FROM log
), winners AS (
    SELECT k, op, name, bal FROM ranked WHERE rn = 1
)
SELECT b.c_custkey, b.c_name, b.c_acctbal
FROM base b LEFT JOIN winners w ON w.k = b.c_custkey
WHERE w.k IS NULL
UNION ALL
SELECT k AS c_custkey, name AS c_name, bal AS c_acctbal
FROM winners WHERE op = 'u'
ORDER BY c_custkey
"""


def _event(base: DataFrame, cond, seq: int, op: str, name_col, bal_col) -> DataFrame:
    return base.filter(cond).select(
        F.col("c_custkey"),
        F.lit(seq).alias("seq"),
        F.lit(op).alias("op"),
        name_col.alias("c_name"),
        bal_col.alias("c_acctbal"),
    )


@register("cdc_apply_changes_witness", oracle=_ORACLE, driver=False)
def cdc_apply_changes_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequenced CDC fold, whole-table value pin."""
    from pyspark_big_data_spark.operators.cdc import apply_changes

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    path = session_tmpdir("cdc_snap_") + "/customer"
    cust.write.mode("overwrite").parquet(path)

    k = F.col("c_custkey")
    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    events = [
        # deliberately NOT in sequence order — the fold must not care
        _event(cust, k % 13 == 2, 50, "d", null_s, null_d),
        _event(cust, k % 5 == 0, 10, "u", F.col("c_name"), F.col("c_acctbal") + 100.0),
        _event(
            cust.filter(k % 11 == 0).withColumn("c_custkey", -(k + 1)),
            F.lit(True),
            10,
            "u",
            F.lit("inserted"),
            F.lit(1.0),
        ),
        _event(cust, k % 14 == 1, 40, "u", F.lit("resurrected"), F.lit(50.0)),
        _event(cust, k % 7 == 1, 30, "d", null_s, null_d),
        _event(cust, k % 15 == 0, 20, "u", F.col("c_name"), F.col("c_acctbal") + 200.0),
    ]
    log = events[0]
    for e in events[1:]:
        log = log.unionByName(e)

    apply_changes(spark, path, log, key="c_custkey", seq_col="seq", op_col="op")
    return spark.read.parquet(path).select(
        "c_custkey", "c_name", "c_acctbal"
    ).orderBy("c_custkey")
