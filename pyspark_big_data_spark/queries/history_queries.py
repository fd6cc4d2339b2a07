"""Snapshot history witness (operators/versioned.py::snapshot_history)
and an equi-depth histogram (the optimizer-statistics shape).

``snapshot_history_witness``: DESCRIBE HISTORY for a 3-version
customer dimension — each version's manifest row count is emitted next
to gates that the count came from METADATA (has_manifest) and that the
version's file census is non-empty. DuckDB recomputes each version's
true row count by replaying the derivation chain as layered CTEs, so a
manifest that drifts from its data (the exact corruption manifests
exist to prevent) flips the row red.

``price_histogram_equidepth``: NTILE-based equi-depth buckets over
order prices — the histogram shape optimizers keep statistics in
(equal mass per bucket, data-driven boundaries), next to the existing
equi-width ``price_histogram``. The total order is tie-broken by
o_orderkey so Spark's and DuckDB's NTILE agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.io import read_table, session_tmpdir
from pyspark_big_data_spark.queries.registry import register

_HIST_ORACLE = """
WITH t AS (
    SELECT o_totalprice,
           NTILE(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
    FROM orders
)
SELECT bucket,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS lo,
       MAX(o_totalprice) AS hi
FROM t
GROUP BY bucket
ORDER BY bucket
"""


@register("price_histogram_equidepth", oracle=_HIST_ORACLE, driver=False)
def price_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-mass price buckets with data-driven boundaries."""
    orders = read_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.withColumn("bucket", F.ntile(8).over(w))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bucket")
    )


_HISTORY_ORACLE = """
WITH v0 AS (
    SELECT c_custkey, c_acctbal FROM customer
), v1 AS (
    SELECT * FROM v0 WHERE c_custkey % 5 <> 2
), v2 AS (
    SELECT c_custkey, c_acctbal + 10.0 AS c_acctbal FROM v1
    UNION ALL
    SELECT -(c_custkey + 1), 1.0 FROM v1 WHERE c_custkey % 9 = 0
)
SELECT 0 AS version, COUNT(*) AS n_rows, 1 AS manifest_gate, 1 AS files_gate FROM v0
UNION ALL
SELECT 1, COUNT(*), 1, 1 FROM v1
UNION ALL
SELECT 2, COUNT(*), 1, 1 FROM v2
ORDER BY version
"""


@register("snapshot_history_witness", oracle=_HISTORY_ORACLE, driver=False)
def snapshot_history_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY from manifests only, counts pinned vs replay."""
    from pyspark_big_data_spark.operators.versioned import (
        read_version,
        snapshot_history,
        write_version,
    )

    root = session_tmpdir("hist_dim_")
    v0 = read_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    write_version(v0, root, stats_cols=["c_custkey"])

    v1 = read_version(spark, root, 0).filter(F.col("c_custkey") % 5 != 2)
    write_version(v1, root, stats_cols=["c_custkey"])

    base = read_version(spark, root, 1)
    v2 = base.select(
        "c_custkey", (F.col("c_acctbal") + 10.0).alias("c_acctbal")
    ).unionByName(
        base.filter(F.col("c_custkey") % 9 == 0).select(
            (-(F.col("c_custkey") + 1)).alias("c_custkey"),
            F.lit(1.0).alias("c_acctbal"),
        )
    )
    write_version(v2, root, stats_cols=["c_custkey"])

    hist = snapshot_history(spark, root)  # metadata-only: no Spark jobs
    rows = [
        (
            h["version"],
            int(h["n_rows"]) if h["n_rows"] is not None else -1,
            1 if h["has_manifest"] else 0,
            1 if h["n_files"] > 0 else 0,
        )
        for h in hist
    ]
    return spark.createDataFrame(
        rows, "version long, n_rows long, manifest_gate int, files_gate int"
    ).orderBy("version")


_HIST_SAMPLED_ORACLE = """
SELECT CAST(i AS BIGINT) AS boundary_idx,
       (SELECT COUNT(*) FROM orders) AS total_orders,
       CAST(1 AS BIGINT) AS rank_gate
FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) t(i)
ORDER BY boundary_idx
"""


@register(
    "price_histogram_equidepth_sampled", oracle=_HIST_SAMPLED_ORACLE, driver=False
)
def price_histogram_equidepth_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-safe equi-depth histogram behind the exact NTILE row
    (``price_histogram_equidepth``): the exact variant's total-order
    window is a single-partition sort — fine for a statistics job at
    sf0.1, unacceptable at 100 TB. This is the concession every
    optimizer makes (sampled statistics): a FIXED-SEED 20% sample of
    orders feeds ``percentile_approx`` (a mergeable distributed
    sketch — no total order, no single partition anywhere), the 7
    sampled boundaries broadcast back as literals, and ONE codegen
    aggregate pass over the FULL table measures each boundary's true
    rank. The oracled contract is a RANK-TOLERANCE GATE vs the exact
    quantiles: ``rank_gate`` = 1 iff the fraction of all orders at or
    below sampled boundary i is within ±0.05 of i/8 (sampling theory:
    the frac estimator's std at 20% of this corpus is ~0.01, so the
    gate has wide margin while still catching a broken sampler, a
    skewed sketch, or boundaries computed on the wrong column);
    ``total_orders`` binds the gate pass to the real table so DuckDB
    verifies the census too. Deterministic by the fixed seed + exact
    final pass, so the gates are stable row-for-row."""
    orders = read_table(spark, sf_dir, "orders").select("o_totalprice")
    fracs = [i / 8.0 for i in range(1, 8)]
    boundaries = (
        orders.sample(fraction=0.2, seed=42)
        .agg(F.percentile_approx("o_totalprice", fracs, 10000).alias("b"))
        .collect()[0]["b"]
    )
    # one full-table pass: 7 conditional counts + the census, no window
    counts = orders.agg(
        F.count(F.lit(1)).alias("total"),
        *[
            F.sum((F.col("o_totalprice") <= F.lit(float(b))).cast("long")).alias(
                f"le_{i}"
            )
            for i, b in enumerate(boundaries, start=1)
        ],
    ).collect()[0]
    total = counts["total"]
    rows = [
        (
            i,
            total,
            1 if abs(counts[f"le_{i}"] / total - i / 8.0) <= 0.05 else 0,
        )
        for i in range(1, 8)
    ]
    return spark.createDataFrame(
        rows, "boundary_idx long, total_orders long, rank_gate long"
    ).orderBy("boundary_idx")
