#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries": {name: sec}, "sf"}.

Timing bracket matches the reference's own methodology
(``src/query1.py:154,167``): session already created, bracket covers
read + plan + action per query.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


HEADLINE = [
    "q1_top_months_per_year",
    "q2_event_time_bins",
    "q3_segment_profile_top",
    "q4_avg_distance",
    "q4_avg_distance_pandas_udf",
    "pricing_summary",
    "revenue_by_nation",
    "order_priority_semi_join",
    # extensions (added as they land); keep list in sync with docs
    "dedup_exact",
    "dedup_minhash_lsh",
    "simhash_near_pairs",
    "text_quality_scores",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "tumbling_window_agg",
    "session_window_agg",
    "asof_join_last_order",
    "running_customer_spend",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None

    from pyspark_big_data_spark.queries import REGISTRY
    from pyspark_big_data_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup (not timed): the reference's bracket also starts
    # from an already-created session (src/query1.py:150-154)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY.get(name)
        if fn is None:
            log(f"bench: skipping {name} (not registered yet)")
            continue
        spark.catalog.clearCache()  # each query pays its own IO, like the reference
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001 — record and continue
            log(f"bench: {name} FAILED: {exc}")
            continue
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        log(f"bench: {name}: {dt:.3f}s ({n} rows)")

    variants = _csv_vs_parquet_variant(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "variants": variants,
                "sf": sf_num,
            }
        )
    )
    spark.stop()


def _csv_vs_parquet_variant(spark, sf_dir: str) -> dict[str, float]:
    """Reproduce the reference's csv-vs-parquet headline comparison
    (BASELINE.md: parquet ~1.75x faster on identical logic) on the
    pricing-summary aggregation over lineitem."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pyspark_big_data_spark import schemas
    from pyspark_big_data_spark.io import read_csv, read_table

    tmp = tempfile.mkdtemp(prefix="bench_csv_")
    try:
        li = read_table(spark, sf_dir, "lineitem")
        csv_path = f"{tmp}/lineitem_csv"
        li.write.option("header", True).mode("overwrite").csv(csv_path)

        def agg(df):
            return (
                df.groupBy("l_returnflag", "l_linestatus")
                .agg(F.count(F.lit(1)).alias("cnt"), F.sum("l_quantity").alias("q"))
                .collect()
            )

        spark.catalog.clearCache()
        t0 = time.time()
        agg(read_csv(spark, csv_path, schemas.LINEITEM))
        csv_sec = time.time() - t0

        spark.catalog.clearCache()
        t0 = time.time()
        agg(read_table(spark, sf_dir, "lineitem"))
        pq_sec = time.time() - t0

        out = {
            "lineitem_agg_csv_sec": round(csv_sec, 3),
            "lineitem_agg_parquet_sec": round(pq_sec, 3),
            "csv_over_parquet_ratio": round(csv_sec / pq_sec, 2) if pq_sec > 0 else None,
        }
        log(f"bench: csv {csv_sec:.3f}s vs parquet {pq_sec:.3f}s")
        return out
    except Exception as exc:  # noqa: BLE001
        log(f"bench: csv variant FAILED: {exc}")
        return {}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
