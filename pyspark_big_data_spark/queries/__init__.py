"""Import all query modules so they self-register."""

from pyspark_big_data_spark.queries import (  # noqa: F401
    analytics,
    ann_ivf,
    behavior,
    cleaning,
    clustering,
    corpus_ops,
    dedup,
    dimension,
    embed_hash,
    event_windows,
    fingerprint,
    graph_rank,
    hybrid_retrieval,
    linkage,
    ml_lsh_queries,
    multimodal_queries,
    pca_reduce,
    q1_top_months,
    q2_time_bins,
    q3_segment_profile,
    q4_distance,
    quality,
    quantization,
    range_join,
    reshaping,
    semi_structured,
    similarity,
    statistics,
    text_analysis,
    training_pipeline,
    truncated_ann,
    window_functions,
)
from pyspark_big_data_spark.queries.registry import ORACLES, REGISTRY, driver_registry

__all__ = ["REGISTRY", "ORACLES", "driver_registry"]
