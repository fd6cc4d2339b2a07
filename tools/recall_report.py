#!/usr/bin/env python
"""Recall-vs-cost report for the ANN / near-dup tiers (VERDICT r1 #9).

The exact O(n^2) baselines define ground truth; each approximate tier is
scored on how much of that truth it recovers and how many candidate
pairs it had to examine to get there (the cost that matters at 100 TB —
candidate volume IS the shuffle+compute bill).

Prints a markdown table; paste into PERFORMANCE.md per round:

    python tools/recall_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pair_set(df, a="id_a", b="id_b"):
    return {(r[a], r[b]) for r in df.collect()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.operators.ml_lsh import brp_lsh_near_neighbors
    from pyspark_big_data_spark.queries.ann_ivf import ann_topk_ivf
    from pyspark_big_data_spark.queries.similarity import (
        _LSH_N_TABLES,
        _LSH_PLANES_PER_TABLE,
        _NEAR_DUP_COS,
        ann_lsh_bucketed,
        ann_topk_bruteforce,
        embedding_near_dup,
        lsh_candidate_pairs,
    )
    from pyspark_big_data_spark.session import get_spark

    spark = get_spark("recall-report")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []

    # --- near-dup pair recall (truth: all-pairs cosine >= 0.40) ---
    truth = pair_set(embedding_near_dup(spark, sf_dir))

    lsh_cand = lsh_candidate_pairs(spark, sf_dir).count()  # pre-verify volume
    lsh_hits = pair_set(ann_lsh_bucketed(spark, sf_dir).filter(F.col("cosine") >= _NEAR_DUP_COS))
    rows.append(
        (
            "near-dup pairs",
            f"ann_lsh_bucketed (SRP, {_LSH_N_TABLES}x{_LSH_PLANES_PER_TABLE} planes)",
            len(lsh_hits & truth),
            len(truth),
            lsh_cand,
        )
    )

    emb = read_table(spark, sf_dir, "embeddings")
    # cos >= 0.40 on unit vectors <=> euclidean <= sqrt(2*(1-0.40)) ~ 1.095
    brp_hits = pair_set(brp_lsh_near_neighbors(emb, euclidean_max=1.095, num_hash_tables=6))
    # candidates examined = co-bucketed pairs before the distance filter
    # (an unbounded threshold makes approxSimilarityJoin emit them all)
    brp_cand = brp_lsh_near_neighbors(emb, euclidean_max=1e9, num_hash_tables=6).count()
    rows.append(
        (
            "near-dup pairs",
            "ann_brp_lsh_ml (6 hash tables)",
            len(brp_hits & truth),
            len(truth),
            brp_cand,
        )
    )

    # --- SemDeDup tier: within-cluster pairs only ---
    from pyspark_big_data_spark.operators.kmeans import kmeans_assignments
    from pyspark_big_data_spark.queries.clustering import (
        _ITERS,
        _K,
        _N_PROBE,
        semantic_dedup,
        semantic_dedup_multiprobe,
    )

    sem_hits = pair_set(semantic_dedup(spark, sf_dir))
    emb_e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    sizes = [
        r["c"]
        for r in kmeans_assignments(emb_e, k=_K, iters=_ITERS)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    sem_cand = sum(s * (s - 1) // 2 for s in sizes)
    rows.append(
        (
            "near-dup pairs",
            f"semantic_dedup (k-means k={_K}, within-cluster)",
            len(sem_hits & truth),
            len(truth),
            sem_cand,
        )
    )
    # cross-cluster miss rate: the truth pairs hard assignment can NEVER
    # compare (the split-cluster failure mode multi-probe exists to fix)
    cross_miss = len(truth - sem_hits)
    print(
        f"semantic_dedup cross-cluster miss rate: {cross_miss}/{len(truth)}"
        f" = {cross_miss / len(truth):.2%} of true pairs split across clusters"
        if truth
        else "no truth pairs"
    )

    mp_hits = pair_set(semantic_dedup_multiprobe(spark, sf_dir))
    mp_sizes = [
        r["c"]
        for r in kmeans_assignments(emb_e, k=_K, iters=_ITERS, n_probe=_N_PROBE)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    mp_cand = sum(s * (s - 1) // 2 for s in mp_sizes)
    rows.append(
        (
            "near-dup pairs",
            f"semantic_dedup_multiprobe (k={_K}, n_probe={_N_PROBE})",
            len(mp_hits & truth),
            len(truth),
            mp_cand,
        )
    )

    # --- top-k recall (truth: brute-force top-k per probe) ---
    from pyspark_big_data_spark.queries.ann_ivf import _NPROBE, _PROBE_MOD

    bf = pair_set(ann_topk_bruteforce(spark, sf_dir), a="probe_id", b="neighbor_id")
    ivf = pair_set(ann_topk_ivf(spark, sf_dir), a="probe_id", b="neighbor_id")
    # candidates examined = probe x corpus-rows-in-probed-cells (the IVF
    # scan bill: NPROBE of the cells per probe)
    n = emb.count()
    n_cells = emb.select("label").distinct().count()
    n_probes = emb.filter(F.col("vec_id") % _PROBE_MOD == 0).count()
    ivf_cand = int(n_probes * n * _NPROBE / n_cells)
    rows.append(
        (
            "top-k neighbors",
            f"ann_topk_ivf ({_NPROBE}/{n_cells} cells)",
            len(ivf & bf),
            len(bf),
            ivf_cand,
        )
    )

    from pyspark_big_data_spark.queries.ann_ivf import ann_topk_ivf_kmeans

    km = pair_set(ann_topk_ivf_kmeans(spark, sf_dir), a="probe_id", b="neighbor_id")
    rows.append(
        (
            "top-k neighbors",
            f"ann_topk_ivf_kmeans ({_NPROBE}/10 Lloyd cells)",
            len(km & bf),
            len(bf),
            ivf_cand,  # same NPROBE/cells scan budget as the label tier
        )
    )

    # --- compressed-candidate tiers: full scan, cheaper bytes/row ---
    from pyspark_big_data_spark.queries.quantization import ann_topk_quantized
    from pyspark_big_data_spark.queries.truncated_ann import (
        _TRUNC_DIM as _TD,
        ann_topk_truncated,
    )

    qz = pair_set(ann_topk_quantized(spark, sf_dir), a="probe_id", b="neighbor_id")
    rows.append(
        (
            "top-k neighbors",
            "ann_topk_quantized (int8 scan, 1/8 bytes, fp rescore 3k/probe)",
            len(qz & bf),
            len(bf),
            n_probes * (n - 1),
        )
    )
    tr = pair_set(ann_topk_truncated(spark, sf_dir), a="probe_id", b="neighbor_id")
    rows.append(
        (
            "top-k neighbors",
            f"ann_topk_truncated (prefix {_TD}, 1/2 bytes, fp rescore 6k/probe)",
            len(tr & bf),
            len(bf),
            n_probes * (n - 1),
        )
    )

    allpairs = n * (n - 1) // 2
    exhaustive = {"near-dup pairs": allpairs, "top-k neighbors": n_probes * (n - 1)}
    print(f"\nGround truth at {sf_dir}: {len(truth)} near-dup pairs, "
          f"{len(bf)} top-k edges, n={n} vectors ({allpairs} all-pairs).\n")
    print("| task | tier | recall | candidates examined | vs exhaustive |")
    print("|---|---|---|---|---|")
    for task, tier, hit, tot, cand in rows:
        rec = hit / tot if tot else float("nan")
        frac = cand / exhaustive[task]
        print(f"| {task} | {tier} | {rec:.2%} ({hit}/{tot}) | {cand} | {frac:.2%} |")
    spark.stop()


if __name__ == "__main__":
    main()
