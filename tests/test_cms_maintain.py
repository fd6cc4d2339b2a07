"""Continuous CMS maintenance: batched folds == single-pass grid,
redelivery idempotence, and persisted-grid point queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.functions import text as TX
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.sketch_freq import cms_cells
from pyspark_big_data_spark.streaming.cms_maintain import cms_lookup, update_cms_index


def _grids_equal(spark, grid_path, expected):
    got = {
        (r["seed"], r["bucket"]): r["cell"]
        for r in spark.read.parquet(grid_path).collect()
    }
    want = {(r["seed"], r["bucket"]): r["cell"] for r in expected.collect()}
    return got == want


def test_three_batch_fold_equals_single_pass(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "cms_idx")
    docs = read_table(spark, sf_dir, "documents")
    for i in range(3):
        stats = update_cms_index(docs.filter(F.col("doc_id") % 3 == i), idx, batch_id=i)
        assert stats["applied"]
    whole = cms_cells(docs.select(F.explode(TX.tokens(F.col("text"))).alias("tok")))
    assert _grids_equal(spark, f"{idx}/grid", whole)


def test_redelivered_batch_is_noop(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "cms_idx2")
    docs = read_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    assert update_cms_index(a, idx, batch_id=0)["applied"]
    assert update_cms_index(b, idx, batch_id=1)["applied"]
    before = spark.read.parquet(f"{idx}/grid").collect()
    # foreachBatch redelivery: same batch_id arrives again -> no double count
    assert update_cms_index(b, idx, batch_id=1)["applied"] is False
    assert update_cms_index(a, idx, batch_id=0)["applied"] is False
    after = spark.read.parquet(f"{idx}/grid").collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))


def test_lookup_from_persisted_grid_never_underestimates(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "cms_idx3")
    docs = read_table(spark, sf_dir, "documents")
    update_cms_index(docs, idx, batch_id=0)
    toks = docs.select(F.explode(TX.tokens(F.col("text"))).alias("tok"))
    exact = {
        r["tok"]: r["c"]
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    some = sorted(exact)[:10]
    est = {r["token"]: r["est_cnt"] for r in cms_lookup(spark, idx, some).collect()}
    for t in some:
        assert est[t] >= exact[t], (t, est[t], exact[t])


def test_streamed_replay_grid_equals_single_pass(spark, sf_dir):
    """The REAL availableNow stream (streaming_cms_replay_witness's
    Spark side) must produce a grid identical cell for cell to the
    single-pass batch grid — the add-commutativity contract, here
    through the full foreachBatch + checkpoint + swap machinery rather
    than direct update_cms_index calls."""
    from pyspark_big_data_spark.queries.sketch_freq import cms_cells
    from pyspark_big_data_spark.queries.stream_witness import (
        streaming_cms_replay_witness,
    )

    streamed = {
        (r["seed"], r["bucket"]): r["cell"]
        for r in streaming_cms_replay_witness(spark, sf_dir).collect()
    }
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TX.tokens(F.col("text"))).alias("tok"))
    batch = {
        (r["seed"], r["bucket"]): r["cell"] for r in cms_cells(toks).collect()
    }
    assert streamed == batch
