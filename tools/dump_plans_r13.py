#!/usr/bin/env python
"""Dump .explain('formatted') plans for the r13-touched query surfaces
into a directory — run from BOTH the pre-optimization worktree and the
optimized tree to produce the plans/r13/<name>_before.txt /
_after.txt pairs the round's deliverable requires.

Covers (a) the returned DataFrame of each touched registry query whose
final frame is a real distributed plan, and (b) the INTERNAL operator
frames whose shape the optimizations changed (the keyed branch-merge
diff join, the triangle census closing join) — witnesses themselves
return tiny local aggregates, so the internal frames are where the
plan evidence lives.

Usage: python tools/dump_plans_r13.py <out_dir> <suffix>
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def grab(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    # the row-hash separators (\x1f / \x00 literals in concat_ws) would
    # make the plan file read as binary — keep it greppable text
    return buf.getvalue().replace("\x1f", "<US>").replace("\x00", "<NUL>")


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.queries import REGISTRY
    from pyspark_big_data_spark.session import get_spark

    spark = get_spark("plans_r13")
    spark.sparkContext.setLogLevel("ERROR")

    def dump(name: str, df) -> None:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(grab(df))
        print("wrote", path)

    # ---- registry queries whose returned frame carries the real plan
    for qname in ("skyline_lineitem_3d", "ann_topk_quantized"):
        dump(qname, REGISTRY[qname](spark, sf_dir))

    # ---- copurchase_triangles: the census returns a collected local
    # row; the evidence plan is the closing semi-join over the canonical
    # edge set (persisted after the optimization)
    from pyspark_big_data_spark.queries.graph_audit import _copurchase_edges

    li = read_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part")
    ).distinct()
    import inspect as _insp

    from pyspark_big_data_spark.operators import graph as _graph

    edges = _copurchase_edges(op)
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi"))
        .distinct()
    )
    # mirror THIS tree's operator: the optimized triangle_count pins the
    # canonical edge set (and the query pins op) before fanning out
    if ".persist()" in _insp.getsource(_graph.triangle_count):
        op = op.persist()
        e = e.persist()
        e.count()
    deg = (
        e.select(F.col("lo").alias("node"))
        .unionByName(e.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    dump("copurchase_triangles_degree", deg)

    # ---- keyed branch merge: the diff-join frame of _keyed_changes
    # over a tiny two-commit chain (shape, not size, is the point)
    import inspect

    from pyspark_big_data_spark.io import session_tmpdir
    from pyspark_big_data_spark.operators import refs
    from pyspark_big_data_spark.operators.merge import merge_into
    from pyspark_big_data_spark.operators.versioned import write_version

    root = session_tmpdir("plans_keyed_")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_version(orders.filter(F.col("o_orderkey") % 64 == 0), root)
    src = orders.filter(F.col("o_orderkey") % 128 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    merge_into(spark, root, src, "o_orderkey")
    sig = inspect.signature(refs._keyed_changes)
    res = refs._keyed_changes(spark, root, 0, 1, ["o_orderkey"])
    upserts = res[0]
    dump("keyed_changes_upserts", upserts)
    if len(res) == 4:  # optimized signature returns the pinned diff
        res[3].unpersist()

    spark.stop()


if __name__ == "__main__":
    _ = main()
