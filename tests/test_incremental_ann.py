"""Incremental ANN: the oracled batch query + the streaming-loop
operator over a persisted IVF index (streaming/incremental_ann.py)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.ann_ivf import (
    _INCR_ANN_MOD,
    _TOP_K,
    ann_topk_ivf_incremental,
)
from pyspark_big_data_spark.streaming.incremental_ann import (
    build_ivf_index,
    process_vector_batch,
)

_AGREE_TOL = 2e-6  # float-summation-order tolerance (np-tier rule)


def _emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"), "label"
    )


@pytest.fixture()
def index_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="ivf_index_")
    corpus = _emb(spark, sf_dir).filter(F.col("vec_id") % _INCR_ANN_MOD != 0)
    build_ivf_index(corpus, d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_probe_never_returns_batch_or_self(spark, sf_dir, index_dir):
    batch = _emb(spark, sf_dir).filter(F.col("vec_id") % _INCR_ANN_MOD == 0)
    out = process_vector_batch(batch, index_dir)
    rows = out.collect()
    batch_ids = {r["vec_id"] for r in batch.select("vec_id").collect()}
    assert rows  # the 10% batch finds neighbors in the 90% corpus
    for r in rows:
        assert r["neighbor_id"] not in batch_ids  # old x new only
        assert r["probe_id"] != r["neighbor_id"]
        assert 1 <= r["rnk"] <= _TOP_K


def test_single_batch_agrees_with_oracled_query(spark, sf_dir, index_dir):
    """One loop step over the corpus-seeded index == the oracled
    ann_topk_ivf_incremental, cosine-at-rank within float tolerance
    (the operator aggregates in plain double — the production tier)."""
    batch = _emb(spark, sf_dir).filter(F.col("vec_id") % _INCR_ANN_MOD == 0)
    loop = {
        (r["probe_id"], r["rnk"]): r["cosine"]
        for r in process_vector_batch(batch, index_dir).collect()
    }
    exact = {
        (r["probe_id"], r["rnk"]): r["cosine"]
        for r in ann_topk_ivf_incremental(spark, sf_dir).collect()
    }
    assert set(loop) == set(exact)
    agree = sum(1 for kk in exact if abs(loop[kk] - exact[kk]) < _AGREE_TOL)
    assert agree / len(exact) >= 0.98


def test_multi_batch_sees_earlier_batches(spark, sf_dir, index_dir):
    """Batch N+1 must be able to find neighbors appended by batch N —
    the loop's whole point: the index grows and late arrivals still see
    everything before them."""
    emb = _emb(spark, sf_dir)
    b1 = emb.filter(F.col("vec_id") % (2 * _INCR_ANN_MOD) == 0)
    b2 = emb.filter(F.col("vec_id") % _INCR_ANN_MOD == 0).filter(
        F.col("vec_id") % (2 * _INCR_ANN_MOD) != 0
    )
    process_vector_batch(b1, index_dir)
    out2 = process_vector_batch(b2, index_dir)
    b1_ids = {r["vec_id"] for r in b1.select("vec_id").collect()}
    neighbors2 = {r["neighbor_id"] for r in out2.collect()}
    # at least the index now CONTAINS b1 (searchable); on this testdata
    # some planted near-dup pairs straddle the two sub-batches
    idx_ids = {
        r["vec_id"]
        for r in spark.read.parquet(f"{index_dir}/vectors").select("vec_id").collect()
    }
    assert b1_ids <= idx_ids
    assert neighbors2  # b2 finds neighbors in corpus ∪ b1
    # and no b2 vector leaked into its own neighbor set
    b2_ids = {r["vec_id"] for r in b2.select("vec_id").collect()}
    assert not (neighbors2 & b2_ids)


def test_missing_index_raises(spark, sf_dir):
    batch = _emb(spark, sf_dir).limit(5)
    with pytest.raises(ValueError, match="missing centroids"):
        process_vector_batch(batch, "/tmp/ivf_index_does_not_exist")


def test_ann_stream_via_foreachbatch(spark, sf_dir, index_dir, tmp_path):
    """End-to-end through Structured Streaming: JSONL vector drops ->
    foreachBatch probe-then-append -> neighbors sink; one micro-batch
    over the corpus-seeded index must reproduce the oracled incremental
    query (cosine-at-rank within float tolerance)."""
    import json as _json

    from pyspark.sql import types as T

    from pyspark_big_data_spark.streaming.incremental_ann import run_ann_stream

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("e", T.ArrayType(T.DoubleType())),
        ]
    )
    batch = _emb(spark, sf_dir).filter(F.col("vec_id") % _INCR_ANN_MOD == 0)
    drop_dir = tmp_path / "drops"
    drop_dir.mkdir()
    with open(drop_dir / "all.jsonl", "w") as fh:
        for r in batch.select("vec_id", "e").collect():
            fh.write(_json.dumps({"vec_id": r["vec_id"], "e": list(r["e"])}) + "\n")

    q = run_ann_stream(
        spark,
        str(drop_dir),
        schema,
        index_dir=index_dir,
        neighbors_dir=str(tmp_path / "neighbors"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = {
        (r["probe_id"], r["rnk"]): r["cosine"]
        for r in spark.read.parquet(str(tmp_path / "neighbors")).collect()
    }
    exact = {
        (r["probe_id"], r["rnk"]): r["cosine"]
        for r in ann_topk_ivf_incremental(spark, sf_dir).collect()
    }
    assert set(got) == set(exact)
    agree = sum(1 for kk in exact if abs(got[kk] - exact[kk]) < _AGREE_TOL)
    assert agree / len(exact) >= 0.98


def test_batch_output_mines_triplets(spark, sf_dir, index_dir):
    """The ANCE loop concretely: the miner consumes the loop's per-batch
    neighbor output directly (same ranked-frame contract), and agrees
    with mining over the oracled incremental query's output — so
    hard-negative refresh costs nothing beyond the ANN search the batch
    already ran."""
    from pyspark_big_data_spark.queries.contrastive import mine_triplets_from_topk

    batch = _emb(spark, sf_dir).filter(F.col("vec_id") % _INCR_ANN_MOD == 0)
    loop_t = {
        (r["anchor_id"], r["neg_rnk"]): (r["pos_cos"], r["neg_cos"])
        for r in mine_triplets_from_topk(process_vector_batch(batch, index_dir)).collect()
    }
    exact_t = {
        (r["anchor_id"], r["neg_rnk"]): (r["pos_cos"], r["neg_cos"])
        for r in mine_triplets_from_topk(ann_topk_ivf_incremental(spark, sf_dir)).collect()
    }
    assert loop_t, "no triplets mined from the loop's batch output"
    assert set(loop_t) == set(exact_t)
    agree = sum(
        1
        for kk in exact_t
        if abs(loop_t[kk][0] - exact_t[kk][0]) < _AGREE_TOL
        and abs(loop_t[kk][1] - exact_t[kk][1]) < _AGREE_TOL
    )
    assert agree / len(exact_t) >= 0.98
