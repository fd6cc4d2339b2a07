#!/usr/bin/env python
"""Per-step Spark-job census of keyed_branch_merge_witness: replays the
witness body with a job group per phase so the 300+ jobs can be
attributed to operator calls. Diagnostic only (not part of the bench).

Usage: PYTHONPATH=. python tools/census_keyed_steps.py
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark_big_data_spark.io import read_table, session_tmpdir
    from pyspark_big_data_spark.operators.deletes import read_version_mor
    from pyspark_big_data_spark.operators.merge import merge_to_branch
    from pyspark_big_data_spark.operators.refs import (
        branch_head,
        create_branch,
        merge_branch,
        merge_branch_keyed,
    )
    from pyspark_big_data_spark.operators.versioned import write_version
    from pyspark_big_data_spark.session import get_spark

    spark = get_spark("census_keyed_steps")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    steps = []

    class step:
        def __init__(self, name):
            self.name = name

        def __enter__(self):
            sc.setJobGroup(f"step:{self.name}", self.name)
            self.t0 = time.time()

        def __exit__(self, *exc):
            wall = time.time() - self.t0
            sc.setJobGroup(None, None)
            jobs = len(
                sc.statusTracker().getJobIdsForGroup(f"step:{self.name}")
            )
            steps.append((self.name, jobs, wall))
            return False

    root = session_tmpdir("census_keyed_")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    rem = lambda r, m=4: orders.filter(F.col("o_orderkey") % m == r)  # noqa: E731
    with step("write_v0+branches"):
        write_version(rem(0), root)
        create_branch(spark, root, "main", 0)
        create_branch(spark, root, "dev", 0)

    dev_src = (
        rem(0, 16)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
        .withColumn("__del", F.lit(False))
        .unionByName(rem(1).withColumn("__del", F.lit(False)))
        .unionByName(rem(8, 16).withColumn("__del", F.lit(True)))
    )
    with step("merge_to_branch dev"):
        merge_to_branch(
            spark, root, "dev", dev_src, "o_orderkey",
            when_matched_update="NOT source.__del",
            when_matched_delete="source.__del",
            when_not_matched_insert="NOT source.__del",
        )
    main_src = (
        rem(4, 16)
        .withColumn("o_totalprice", F.col("o_totalprice") + 2.0)
        .unionByName(rem(2))
    )
    with step("merge_to_branch main"):
        merge_to_branch(spark, root, "main", main_src, "o_orderkey")

    with step("merge_branch refuse"):
        try:
            merge_branch(spark, root, "dev", "main")
        except ValueError:
            pass

    with step("keyed merge #1 (real)"):
        merge_branch_keyed(spark, root, "dev", "main", "o_orderkey")
    with step("keyed merge #2 (noop)"):
        merge_branch_keyed(spark, root, "dev", "main", "o_orderkey")

    ident_src = rem(12, 16).withColumn(
        "o_totalprice", F.col("o_totalprice") + 3.0
    )
    with step("ident merges dev+main"):
        for br in ("dev", "main"):
            merge_to_branch(spark, root, br, ident_src, "o_orderkey")
    with step("keyed merge #3 (identical)"):
        merge_branch_keyed(spark, root, "dev", "main", "o_orderkey")
    with step("ident_src.count gate"):
        ident_src.count()

    conflict_src = rem(4, 16).limit(1).withColumn(
        "o_totalprice", F.col("o_totalprice") + 9.0
    )
    with step("merge_to_branch conflict"):
        merge_to_branch(spark, root, "dev", conflict_src, "o_orderkey")
    with step("keyed merge #4 (conflict)"):
        try:
            merge_branch_keyed(spark, root, "dev", "main", "o_orderkey")
        except ValueError:
            pass

    with step("final MOR agg"):
        merged = read_version_mor(
            spark, root, branch_head(spark, root, "main")
        )
        merged.agg(F.count(F.lit(1))).collect()

    total_jobs = sum(s[1] for s in steps)
    total_wall = sum(s[2] for s in steps)
    for name, jobs, wall in steps:
        print(f"{jobs:5d} jobs  {wall:7.2f}s  {name}")
    print(f"{total_jobs:5d} jobs  {total_wall:7.2f}s  TOTAL")
    spark.stop()


if __name__ == "__main__":
    main()
