"""Plan guardrails over EVERY registered query: no accidental cartesian
products, and Python workers only where the query deliberately uses
them. This is the test that keeps future operators honest at scale."""

from __future__ import annotations

import pytest

from pyspark_big_data_spark.queries import REGISTRY
from pyspark_big_data_spark.testing import physical_plan

# queries whose SEMANTICS are a python-eval path
_PYTHON_OK = {
    "q4_avg_distance_pandas_udf",
    "q4_avg_distance_geodesic",
    "q4_avg_distance_sql_udf",
    "multimodal_feature_extract",
    "multimodal_resize",  # Arrow mapInPandas resample by design
    "multimodal_frame_sample",  # Arrow mapInPandas chunker by design
    "multimodal_real_decode",  # stdlib PPM decode runs in Python by design
    "multimodal_real_resize",
    "multimodal_audio_features",  # stdlib WAV decode runs in Python by design
    "multimodal_audio_resample",
    "multimodal_video_frames",  # PPM-stream demux + per-frame decode by design
    "dedup_minhash_ml",  # ml models may stage through python/udf wrappers
    "ann_brp_lsh_ml",
    "ann_topk_bruteforce_np",  # BLAS fast tiers: Arrow mapInPandas by design
    "ann_topk_ivf_np",
    "ann_topk_quantized_np",  # int8-GEMM candidate stage: Arrow mapInPandas by design
    "ann_topk_ivf_quantized",  # IVF x int8 composition: same Arrow scan by design
    "ann_topk_truncated_np",  # prefix-GEMM candidate stage: Arrow mapInPandas by design
    "semantic_dedup_np",  # BLAS fast tier: applyInPandas per cluster
    "semantic_dedup_multiprobe_np",  # BLAS soft-assignment tier: same Arrow paths
    "kmeans_clusters_np",  # BLAS fast tier: broadcast-centroid mapInPandas
    "embedding_pca_project",  # partial-moments pass is Arrow mapInPandas by design
    # two-phase distributed skyline: the dominance kernel is an Arrow
    # mapInPandas block-nested-loop by design (no SQL-expressible
    # non-quadratic form); phase 1 prunes before any shuffle
    "skyline_parts_price_size",
    "skyline_lineitem_3d",
    # runtime-filter pattern: the bloom build (partial bitmaps per
    # partition) and the fact-side membership probe are vectorized
    # numpy mapInPandas by design; the exact semi-join stays JVM-side
    "bloom_semi_join_witness",
    # r14: the planted fixture (hashlib twin of the md5 expression
    # tree) and the exact-truth chunk kernel (dot_flat-order numpy,
    # the skyline pattern) are Arrow mapInPandas by design
    "planted_lsh_recall_witness",
    # distributed zipWithIndex: the per-partition offset numbering pass
    # is mapInPandas by design — the whole point is avoiding the
    # single-partition Window a global row_number would plan
    "surrogate_keys_customers",
    "ann_topk_ivf_kmeans",  # BLAS IVF over Lloyd cells: mapInPandas by design
    # cross-tier agreement witnesses: each embeds its np tier's Arrow
    # stage next to the exact tier's plan by construction
    "ann_bruteforce_np_agreement",
    "ann_ivf_np_agreement",
    "ann_quantized_np_agreement",
    "ann_truncated_np_agreement",
    "ann_ivf_quantized_agreement",
    "kmeans_np_agreement",
    "semantic_multiprobe_np_agreement",
    "ann_ivfpq_witness",
    "pca_project_witness",  # embeds the Arrow moments pass
    # round 6: the exact-Lloyd phase 1 is a mapInPandas PRE-CUT
    # (operators/kmeans.py::_phase1_candidates — shuffle-free candidate
    # generation; the decimal-exact phase 2 still decides), so every
    # query embedding kmeans_assignments carries one Arrow stage
    "kmeans_clusters",
    "semantic_dedup",
    "semantic_dedup_multiprobe",
    "ann_topk_pq",
    "ann_topk_ivfpq",
    # round 7: the same phase-1 pattern applied to the ADC scan and the
    # int8 candidate stage (queries/pq.py::_pq_probe,
    # queries/quantization.py::ann_topk_quantized — exact phase 2
    # decides, oracles unchanged)
    "ann_topk_pq_prebuilt",
    "ann_topk_quantized",
    # embed the tiers above (np applyInPandas matmul / BLAS IVF scan)
    "semantic_dedup_np_agreement",
    "ann_ivf_kmeans_witness",
}

# inequality-only self-join conditions legitimately plan as
# BroadcastNestedLoopJoin at test scale (documented O(n^2) baselines
# with registered bucketed scale twins + input-size guards)
_NESTED_LOOP_OK = {
    "embedding_near_dup",
    "ann_topk_bruteforce",
    # corpus x broadcast(int8 probes): build side is the probe sample
    "ann_topk_quantized",
    # corpus x broadcast(prefix-dim probes): same shape, prefix flat cols
    "ann_topk_truncated",
    "doc_embed_near_dup",  # guarded all-pairs witness over hashed doc vectors
    # corpus x broadcast(guarded anchor sample): same shape as
    # ann_topk_bruteforce — anchors are the broadcast build side
    "contrastive_triplets",
    # embeds ann_topk_bruteforce (above) as its top-k input; the miner
    # adds only bounded window/join algebra on top
    "contrastive_triplets_topk",
    # embeds embedding_near_dup (above) as its guarded truth side
    "lsh_recall_witness",
    # corpus x broadcast(probe vectors): the build side is the held-out
    # benchmark set — small by definition, so the nested loop is a
    # map-side scan against a broadcast, not an O(n^2) blowup
    "decontaminate_semantic",
    # embeds ann_topk_bruteforce (above) as its exact reference side;
    # the witness adds only an equi-join + count on top
    "ann_bruteforce_np_agreement",
    # exact-Lloyd phase 1: corpus × broadcast(k centroid ARRAYS) with an
    # inline unrolled distance — build side is k rows by construction,
    # a map-side fan-out, not a data×data cartesian (operators/kmeans.py)
    "kmeans_clusters",
    "semantic_dedup",
    "semantic_dedup_np",
    "semantic_dedup_multiprobe",
    # embed the SAME exact-Lloyd phase-1 (corpus × broadcast(K=64
    # sub-centroids) per subspace) via pq_codes_and_books — build side
    # is K rows by construction, identical to kmeans_clusters above
    "ann_topk_pq",
    "ann_topk_ivfpq",
    # SCD2 dim x broadcast(3 literal probe dates) with an interval
    # condition: build side is a constant-size literal frame, a
    # map-side interval test, not a data x data product
    "scd2_point_in_time",
    # round-6 witnesses embedding the BNLJ-allowlisted tiers above as
    # their exact/truth sides (the witness adds only equi-joins + a
    # 1-row agg on top)
    "ann_quantized_np_agreement",  # embeds ann_topk_quantized
    "ann_truncated_np_agreement",  # embeds ann_topk_truncated
    "ann_ivfpq_witness",  # guarded exact-L2 corpus x broadcast(probes) truth
    "planted_lsh_recall_witness",  # guarded all-pairs truth over planted vectors
    "ann_ivf_kmeans_witness",  # embeds ann_topk_bruteforce as its truth side
    "brp_lsh_ml_witness",  # embeds embedding_near_dup as its truth side
    "semantic_dedup_np_agreement",  # embeds semantic_dedup + its np twin
}

# crossJoin(broadcast(one_row_aggregate)): the build side is exactly ONE
# row (a global-stats scalar), so the nested loop degenerates to a
# map-side constant attach with zero blowup at any scale — unlike the
# O(n^2) class above. Catalyst constant-folds literal equi-keys away,
# so this is the only spelling of a scalar attach.
_SCALAR_BROADCAST_OK = {
    "bm25_topk",
    # the (1-row n_docs/sum_dl stats) x (1-row per-term df) attaches of
    # the index-served ranker — same shape as bm25_topk's, over the
    # doclen sidecar instead of the corpus scan
    "bm25_from_index_topk",
    "bigram_fluency",
    # bm25_scored's 1-row stats attach + the 1-row probe-vector attach
    "hybrid_rrf_topk",
    # embeds hybrid_rrf_topk (above) + a 1-row probe-token-set attach
    "hybrid_rerank_topk",
    # node-count + dangling-mass 1-row attaches, once per iteration
    "trade_pagerank",
    # two 1-row sketch frames joined for the inclusion-exclusion
    "user_overlap_sketch",
    # per-relation (1-row child count) x (1-row orphan count) attaches
    "referential_integrity_audit",
    # (1-row truth/hit counts) x (1-row candidate count) attach
    "lsh_recall_witness",
    # per-relation (1-row erase count) x (1-row keep count) attaches
    "user_erasure_audit",
    # (1-row pair counts) x (1-row candidate count) x (1-row n) attaches
    "planted_lsh_recall_witness",
    # (1-row exact intersection) x (1-row sketch estimate) attach
    "user_overlap_sketch_witness",
    # (1-row user-band aggregate) x (1-row value-tail aggregate) attach,
    # plus zorder_key's 1-row global min/max stats attach
    "zorder_pruned_read_witness",
    # (512-row bucket counts) x (1-row corpus feature totals) attach
    "dsir_importance_weights",
    # r10: (token counts) x (1-row label totals) attach
    "chi2_token_label",
    # r10: (1-row node census) x (1-row edge census) attach
    "kcore_copurchase",
    # r10: (bigram lift rows) x (1-row corpus token total) attach
    "pmi_collocations",
    # r10: three 1-row pruned-read aggregates attach, plus
    # zorder_key_n's 1-row global min/max stats attach
    "zorder3_pruned_read_witness",
    # r12: (1-row facts aggregate) x (1-row byprio aggregate) attach
    # over the txn-resolved reads
    "streaming_multitxn_replay_witness",
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_cartesian_and_no_stray_python(spark, sf_dir, name):
    df = REGISTRY[name](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"
    if name not in _NESTED_LOOP_OK | _SCALAR_BROADCAST_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a nested-loop join — missing an equi-join key?"
        )
    if name not in _PYTHON_OK:
        for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
            assert node not in plan, f"{name} unexpectedly ships rows to Python ({node})"
