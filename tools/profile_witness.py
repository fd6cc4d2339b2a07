#!/usr/bin/env python
"""Operator-level wall-clock profiler for compound witness queries.

Wraps the hot operator entry points with timing counters, runs one
registry query at $SPARK_GRAFT_SF_DIR (default sf0.1), and prints a
per-function (calls, cumulative seconds) table. Cumulative times nest
(merge_into includes the write_version calls it makes), so read the
table top-down as "where does wall time pass through", not as a
partition of the total.

Usage: python tools/profile_witness.py <query_name> [<query_name> ...]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

STATS: dict[str, list[float]] = defaultdict(lambda: [0, 0.0])
DEPTH = [0]


def wrap(mod, name: str) -> None:
    fn = getattr(mod, name)
    label = f"{mod.__name__.rsplit('.', 1)[-1]}.{name}"

    def timed(*a, **kw):
        t0 = time.time()
        DEPTH[0] += 1
        try:
            return fn(*a, **kw)
        finally:
            DEPTH[0] -= 1
            dt = time.time() - t0
            STATS[label][0] += 1
            STATS[label][1] += dt

    timed.__wrapped__ = fn
    setattr(mod, name, timed)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark_big_data_spark.operators import (
        cdf,
        deletes,
        merge,
        multitxn,
        refs,
        versioned,
    )

    for fname in (
        "write_version",
        "_collect_file_stats",
        "latest_version",
        "list_versions",
        "manifest",
        "read_version",
        "version_chain",
        "_validate_append_base",
    ):
        wrap(versioned, fname)
    for fname in ("read_version_mor", "_chain_vectors", "delete_keys"):
        wrap(deletes, fname)
    for fname in ("merge_into",):
        wrap(merge, fname)
    for fname in ("merge_branch_keyed", "merge_branch", "branch_head",
                  "update_branch", "create_branch"):
        if hasattr(refs, fname):
            wrap(refs, fname)
    for fname in ("table_changes_typed",):
        if hasattr(cdf, fname):
            wrap(cdf, fname)
    for fname in ("commit_txn",):
        if hasattr(multitxn, fname):
            wrap(multitxn, fname)

    # merge.py imported symbols by value at module load: rebind
    merge.read_version_mor = deletes.read_version_mor
    merge.append_version = versioned.append_version
    merge.read_version = versioned.read_version
    merge._resolve_version = versioned._resolve_version

    from pyspark_big_data_spark.queries import REGISTRY
    from pyspark_big_data_spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm codegen

    for qname in names:
        STATS.clear()
        spark.catalog.clearCache()
        t0 = time.time()
        n = REGISTRY[qname](spark, sf_dir).count()
        total = time.time() - t0
        print(f"\n== {qname}: {total:.3f}s total ({n} rows)")
        for label, (calls, secs) in sorted(STATS.items(), key=lambda kv: -kv[1][1]):
            print(f"  {secs:8.3f}s  {calls:4d} calls  {label}")
    spark.stop()


if __name__ == "__main__":
    main()
