#!/usr/bin/env python
"""Dump .explain('formatted') plans for the r14-touched query surfaces
into plans/r14/<name>_<suffix>.txt — run once at the pre-optimization
commit (suffix "before") and once on the optimized tree (suffix
"after").

Covers the returned DataFrames of touched registry queries that carry a
real distributed plan (hybrid_rrf_topk, planted_lsh_recall_witness)
and the INTERNAL operator frames the r14 changes reshape (the keyed
branch-merge diff extracts and merge source — witnesses themselves
return tiny local aggregates, so the internal frames are where the
plan evidence lives).

Usage: PYTHONPATH=. python tools/dump_plans_r14.py <out_dir> <suffix>
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
    # keep the row-hash separators greppable text
    return buf.getvalue().replace("\x1f", "<US>").replace("\x00", "<NUL>")


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.queries import REGISTRY
    from pyspark_big_data_spark.session import get_spark

    spark = get_spark("plans_r14")
    spark.sparkContext.setLogLevel("ERROR")

    def dump(name: str, df) -> None:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(grab(df))
        print("wrote", path)

    # ---- registry queries whose returned frame carries the real plan.
    # (After the optimization hybrid_rrf_topk's returned frame is a
    # local-relation fusion — its corpus plan then lives in the shared
    # tokenize+aggregate frame dumped below.)
    for qname in ("hybrid_rrf_topk", "planted_lsh_recall_witness"):
        dump(qname, REGISTRY[qname](spark, sf_dir))

    # ---- hybrid retrieval: the corpus-pass frame(s). Before: the two
    # independent tokenize passes (bm25_scored / hashed_doc_vectors).
    # After: the single shared tokenize+aggregate pass.
    import pyspark_big_data_spark.queries.hybrid_retrieval as HR

    docs = read_table(spark, sf_dir, "documents")
    if hasattr(HR, "_shared_doc_stats"):
        dump("hybrid_corpus_pass", HR._shared_doc_stats(docs))
    else:
        from pyspark_big_data_spark.queries.corpus_ops import bm25_scored
        from pyspark_big_data_spark.queries.embed_hash import hashed_doc_vectors

        dump("hybrid_corpus_pass_lex", bm25_scored(docs))
        dump("hybrid_corpus_pass_den", hashed_doc_vectors(docs))

    # ---- keyed branch merge: the diff-extract frame of _keyed_changes
    # over a tiny two-commit chain (shape, not size, is the point)
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
    res = refs._keyed_changes(spark, root, 0, 1, ["o_orderkey"])
    upserts = res[0]
    dump("keyed_changes_upserts", upserts)
    res[3].unpersist()

    # ---- the diff JOIN itself, with the shared base projection the
    # way merge_branch_keyed builds it (hash-partitioned by the merge
    # keys before pinning): the o-side Exchange disappears from the
    # join because the cached distribution already satisfies it. For
    # an in-tree A/B, the "unpartitioned" twin pins the same
    # projection WITHOUT the repartition — its plan carries one more
    # Exchange under the full-outer join.
    if hasattr(refs, "_keyed_diff"):
        from pyspark.sql import functions as F2

        from pyspark_big_data_spark.operators.deletes import read_version_mor

        keys = ["o_orderkey"]
        base_state = read_version_mor(spark, root, 0)
        nonkey = [c for c in base_state.columns if c not in keys]
        proj = base_state.select(
            *keys,
            refs._row_hash(keys, nonkey).alias("__oh"),
            F2.lit(1).alias("__o"),
        )
        for label, side in (
            ("keyed_diff_join", proj.repartition(*[F2.col(k) for k in keys])),
            ("keyed_diff_join_unpartitioned", proj),
        ):
            bp = side.persist()
            bp.count()
            _, _, j, _ = refs._keyed_diff(spark, root, 0, 1, keys, _base_proj=bp)
            dump(label, j)
            j.unpersist()
            bp.unpersist()

    spark.stop()


if __name__ == "__main__":
    _ = main()
