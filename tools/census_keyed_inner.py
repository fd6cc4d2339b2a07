#!/usr/bin/env python
"""Sub-step job census INSIDE one merge_branch_keyed call: mirrors the
operator body (refs.merge_branch_keyed) with a job group per internal
action, over the same two-branch fixture the witness builds.
Diagnostic only.

Usage: PYTHONPATH=. python tools/census_keyed_inner.py
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
        _keyed_changes,
        _merge_reachable,
        _row_hash,
        branch_head,
        create_branch,
        merge_base,
    )
    from pyspark_big_data_spark.operators.versioned import write_version
    from pyspark_big_data_spark.session import get_spark

    spark = get_spark("census_keyed_inner")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    steps = []

    class step:
        def __init__(self, name):
            self.name = name

        def __enter__(self):
            sc.setJobGroup(f"s:{self.name}", self.name)
            self.t0 = time.time()

        def __exit__(self, *exc):
            wall = time.time() - self.t0
            sc.setJobGroup(None, None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(f"s:{self.name}"))
            steps.append((self.name, jobs, wall))
            return False

    root = session_tmpdir("census_keyed_inner_")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    rem = lambda r, m=4: orders.filter(F.col("o_orderkey") % m == r)  # noqa: E731
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
    merge_to_branch(spark, root, "main", main_src, "o_orderkey")

    # ---- mirrored merge_branch_keyed("dev" -> "main") body
    keys = ["o_orderkey"]
    head_s = branch_head(spark, root, "dev")
    head_t = branch_head(spark, root, "main")
    mcache: dict = {}
    reach_t = _merge_reachable(spark, root, head_t, _cache=mcache)
    base = merge_base(
        spark, root, head_s, head_t, _cache=mcache, _reach_b=reach_t
    )
    with step("base_proj build+repartition (lazy)"):
        base_state = read_version_mor(spark, root, base)
        base_nonkey = [c for c in base_state.columns if c not in keys]
        base_proj = (
            base_state.select(
                *keys, _row_hash(keys, base_nonkey).alias("__oh"),
                F.lit(1).alias("__o"),
            )
            .repartition(*[F.col(k) for k in keys])
            .persist()
        )
    with step("keyed_changes s (null agg)"):
        s_up, s_del, s_changed, j_s, s_n = _keyed_changes(
            spark, root, base, head_s, keys, _base_proj=base_proj
        )
    with step("keyed_changes t (null agg)"):
        _, _, t_changed, j_t, t_n = _keyed_changes(
            spark, root, base, head_t, keys, _base_proj=base_proj
        )
    with step("overlap count"):
        overlap = s_changed.join(t_changed, keys, "left_semi").persist()
        n_overlap = overlap.count()
    print("n_overlap =", n_overlap, "s_n =", s_n, "t_n =", t_n)
    with step("merge_to_branch (src replay)"):
        src = s_up.withColumn("__del", F.lit(False)).unionByName(
            s_del.withColumn("__del", F.lit(True))
        )
        merge_to_branch(
            spark, root, "main", src, "o_orderkey",
            when_matched_update="NOT source.__del",
            when_matched_delete="source.__del",
            when_not_matched_insert="NOT source.__del",
            manifest_extra={
                "merged_from": head_s, "merge_base": base,
                "merge_mode": "keyed",
            },
        )
    for df in (base_proj, j_s, j_t, overlap):
        df.unpersist()

    total_jobs = sum(s[1] for s in steps)
    for name, jobs, wall in steps:
        print(f"{jobs:5d} jobs  {wall:7.2f}s  {name}")
    print(f"{total_jobs:5d} jobs  TOTAL (one keyed merge)")
    spark.stop()


if __name__ == "__main__":
    main()
