"""Int8 quantization invariants beyond the DuckDB parity (which
tests/test_oracle_parity.py covers for both registered queries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.quantization import (
    _Q,
    _TOP_K,
    ann_topk_quantized,
    quantized_vectors,
)
from pyspark_big_data_spark.queries.similarity import ann_topk_bruteforce


def _emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )


def test_quantization_roundtrip_error_bound(spark, sf_dir):
    """Dequantized values must sit within scale/2 of the original —
    the defining property of half-up absmax quantization — and every
    quantized component within the int8 range."""
    qv = quantized_vectors(_emb(spark, sf_dir))
    oob = qv.select(F.size(F.filter(F.col("q"), lambda x: F.abs(x) > _Q)).alias("oob"))
    assert oob.agg(F.sum("oob")).collect()[0][0] == 0

    joined = qv.join(_emb(spark, sf_dir), "vec_id")
    max_err = joined.select(
        F.array_max(
            F.zip_with(
                "e", "q", lambda x, q: F.abs(x - q.cast("double") * F.col("scale"))
            )
        ).alias("err"),
        (F.col("scale") / 2 + F.lit(1e-12)).alias("bound"),
    )
    assert max_err.filter(F.col("err") > F.col("bound")).count() == 0


def test_quantized_ann_recall_vs_exact(spark, sf_dir):
    """The int8-ranked, fp-rescored top-k must recover nearly all of
    the exact brute-force top-k (int8 on 64 dims loses ~0.4% cosine
    resolution; the 3k rescore pool absorbs almost every flip)."""
    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in ann_topk_bruteforce(spark, sf_dir).collect()
    }
    quant = {
        (r["probe_id"], r["neighbor_id"])
        for r in ann_topk_quantized(spark, sf_dir).collect()
    }
    assert len(quant) == len(exact)
    assert len(quant & exact) / len(exact) >= 0.9


def test_quantized_ann_shape(spark, sf_dir):
    out = ann_topk_quantized(spark, sf_dir)
    rows = out.collect()
    per_probe: dict = {}
    for r in rows:
        per_probe.setdefault(r["probe_id"], []).append(r["rnk"])
        assert r["probe_id"] != r["neighbor_id"]
    for rnks in per_probe.values():
        assert sorted(rnks) == list(range(1, _TOP_K + 1))


def test_int8_gemm_tier_matches_oracled_tier(spark, sf_dir):
    """ann_topk_quantized_np shares the oracled tier's exact int8 codes
    (same floor expression on the same doubles), so the two tiers can
    only diverge where the dequantize-multiply order flips a pool
    boundary tie — demand near-total agreement and 6dp cosine equality
    on the overlap."""
    from pyspark_big_data_spark.queries.quantization import (
        ann_topk_quantized,
        ann_topk_quantized_np,
    )

    exact = {
        (r["probe_id"], r["neighbor_id"]): r["cosine"]
        for r in ann_topk_quantized(spark, sf_dir).collect()
    }
    fast = {
        (r["probe_id"], r["neighbor_id"]): r["cosine"]
        for r in ann_topk_quantized_np(spark, sf_dir).collect()
    }
    assert len(fast) == len(exact)
    overlap = set(exact) & set(fast)
    assert len(overlap) / len(exact) >= 0.98
    for key in overlap:
        assert abs(exact[key] - fast[key]) < 2e-6


def test_int8_gemm_probe_sharding_is_exact(spark, sf_dir):
    """Sharding the int8 probe matrix must not change the result set:
    candidates per probe come only from that probe's shard scan and the
    global pool window runs over the union."""
    from pyspark_big_data_spark.queries.quantization import ann_topk_quantized_np

    def rows(df):
        return {(r["probe_id"], r["neighbor_id"], r["rnk"]) for r in df.collect()}

    assert rows(ann_topk_quantized_np(spark, sf_dir, probe_shards=1)) == rows(
        ann_topk_quantized_np(spark, sf_dir, probe_shards=3)
    )


def test_ivf_quantized_matches_fp_ivf_tier(spark, sf_dir):
    """The IVF x int8 composition searches the SAME top-NPROBE cells as
    the fp IVF tiers, and int8 at dim 64 is near-lossless — so its
    top-k should agree with ann_topk_ivf_np almost exactly (pool
    boundary ties aside)."""
    from pyspark_big_data_spark.queries.ann_ivf import ann_topk_ivf_np
    from pyspark_big_data_spark.queries.quantization import ann_topk_ivf_quantized

    fp = {
        (r["probe_id"], r["neighbor_id"])
        for r in ann_topk_ivf_np(spark, sf_dir).collect()
    }
    q8 = {
        (r["probe_id"], r["neighbor_id"])
        for r in ann_topk_ivf_quantized(spark, sf_dir).collect()
    }
    assert len(q8) == len(fp)
    assert len(q8 & fp) / len(fp) >= 0.98


def test_ivf_quantized_is_subset_of_probed_cells(spark, sf_dir):
    """No neighbor may come from a cell the probe did not rank in its
    top NPROBE — the candidate-count guarantee the composition exists
    for."""
    import numpy as np
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.queries.ann_ivf import _NPROBE
    from pyspark_big_data_spark.queries.quantization import ann_topk_ivf_quantized

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"), "label"
    )
    rows = emb.collect()
    vec = {r["vec_id"]: np.array(r["e"]) for r in rows}
    cell = {r["vec_id"]: r["label"] for r in rows}
    labels = sorted({r["label"] for r in rows})
    cmat = np.stack(
        [np.mean([vec[v] for v in vec if cell[v] == lab], axis=0) for lab in labels]
    )
    cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

    for r in ann_topk_ivf_quantized(spark, sf_dir).collect():
        p = vec[r["probe_id"]] / np.linalg.norm(vec[r["probe_id"]])
        ranked = np.argsort(-(p @ cmat.T), kind="stable")[:_NPROBE]
        allowed = {labels[i] for i in ranked}
        assert cell[r["neighbor_id"]] in allowed
