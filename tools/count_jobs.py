#!/usr/bin/env python
"""Spark-job census per registry query: run each named query to
completion under a unique job group and print (jobs, wall seconds).

Job count is the noise-immune evidence for action-elimination
optimizations (each removed count()/collect()/write() action is one
fewer job regardless of box contention); wall seconds ride along for
context. Usage: python tools/count_jobs.py <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark_big_data_spark.queries import REGISTRY
    from pyspark_big_data_spark.session import get_spark

    spark = get_spark("count_jobs")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm codegen

    for pos, qname in enumerate(names):
        spark.catalog.clearCache()
        # position-unique group: passing the same query name twice must
        # not accumulate job ids across invocations (r14 gotcha)
        group = f"census:{pos}:{qname}"
        sc.setJobGroup(group, qname)
        t0 = time.time()
        REGISTRY[qname](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        sc.setJobGroup(None, None)
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        print(f"{qname}: {jobs} jobs, {wall:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
