#!/usr/bin/env python
"""Shuffle-key skew report for the engine's hot aggregation/join keys.

Every banded/bucketed operator turns O(n²) similarity into Σ bucket²
equi-join work — which means ONE hot key (boilerplate text, a dominant
cluster) can own the bill. This tool measures, per hot key family, the
distribution that actually lands on the shuffle: top-key share, p99 and
max bucket sizes vs the mean, and the Σ size² concentration (what share
of the candidate-pair bill the top 1% of keys carries). These are the
numbers behind PERFORMANCE.md's "AQE skew handling applies" claims.

    python tools/skew_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _report(name: str, sizes: list[int]) -> tuple:
    import math

    n = len(sizes)
    total = sum(sizes)
    s = sorted(sizes)
    mean = total / n
    p99 = s[min(n - 1, math.ceil(0.99 * n) - 1)]
    mx = s[-1]
    bill = sum(c * (c - 1) // 2 for c in sizes)
    top1 = s[-max(1, n // 100) :]
    bill_top1 = sum(c * (c - 1) // 2 for c in top1)
    return (
        name,
        n,
        round(mean, 2),
        p99,
        mx,
        round(mx / mean, 1),
        bill,
        round(bill_top1 / bill, 3) if bill else float("nan"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.operators import dedup as DD
    from pyspark_big_data_spark.operators.kmeans import kmeans_assignments
    from pyspark_big_data_spark.session import get_spark

    spark = get_spark("skew-report")
    spark.sparkContext.setLogLevel("ERROR")

    def bucket_sizes(df, *keys) -> list[int]:
        return [r["c"] for r in df.groupBy(*keys).agg(F.count(F.lit(1)).alias("c")).collect()]

    rows = []
    docs = read_table(spark, sf_dir, "documents")

    sigs = DD.minhash_signatures(DD.shingles(docs)).cache()
    rows.append(_report("minhash band buckets", bucket_sizes(DD.band_keys(sigs), "band_no", "band")))

    sh = DD.simhash(docs)
    rows.append(
        _report(
            "simhash block-pair buckets",
            bucket_sizes(DD.simhash_block_keys(sh), "pair_id", "v1", "v2"),
        )
    )

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    rows.append(
        _report("k-means clusters (k=8)", bucket_sizes(kmeans_assignments(emb, k=8, iters=3), "cluster"))
    )

    from pyspark_big_data_spark.queries.similarity import _LSH_TABLES
    from pyspark_big_data_spark.functions import vectors as V

    buckets = F.array(*[V.simhash_bucket(F.col("e"), planes) for planes in _LSH_TABLES])
    tabled = emb.select("vec_id", F.posexplode(buckets).alias("t", "bucket"))
    rows.append(_report("SRP-LSH (table,bucket)", bucket_sizes(tabled, "t", "bucket")))

    print(f"\nShuffle-key skew at {sf_dir}:\n")
    print("| key family | keys | mean | p99 | max | max/mean | Σ pair bill | top-1% bill share |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(str(x) for x in r) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
