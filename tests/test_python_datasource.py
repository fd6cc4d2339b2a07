"""Custom Python DataSource (sources/synthetic_docs.py): schema, option
handling, partition planning, determinism, and retry-safety semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.sources import register_synth_docs
from pyspark_big_data_spark.sources.synthetic_docs import _make_doc


def _read(spark, **opts):
    register_synth_docs(spark)
    r = spark.read.format("synth_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schema_and_count(spark):
    df = _read(spark, n_docs=257, n_parts=4)
    assert [f.name for f in df.schema.fields] == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.count() == 257
    # doc_ids are the full contiguous range exactly once
    ids = [r[0] for r in df.select("doc_id").collect()]
    assert sorted(ids) == list(range(257))


def test_partition_planning_parallelizes(spark):
    df = _read(spark, n_docs=1000, n_parts=8)
    assert df.rdd.getNumPartitions() == 8
    # uneven split: ceil-division shards cover everything
    df2 = _read(spark, n_docs=10, n_parts=3)
    assert df2.count() == 10


def test_deterministic_across_reads_and_tasks(spark):
    """Same options => byte-identical data, independent of partition
    count — the retry-safety property (a re-executed shard must
    regenerate identical rows)."""
    a = _read(spark, n_docs=100, n_parts=2, seed=7).orderBy("doc_id").collect()
    b = _read(spark, n_docs=100, n_parts=5, seed=7).orderBy("doc_id").collect()
    assert a == b
    # and matches the driver-side generator row for row
    assert tuple(a[3]) == _make_doc(7, 3)
    # different seed => different corpus
    c = _read(spark, n_docs=100, n_parts=2, seed=8).orderBy("doc_id").collect()
    assert a != c


def test_composes_with_engine_operators(spark):
    """The generated frame is a first-class DataFrame: filters,
    aggregates, and joins against it plan normally."""
    df = _read(spark, n_docs=500, n_parts=4)
    by_src = df.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sum(r["n"] for r in by_src) == 500
    assert {r["source"] for r in by_src} <= {"web", "wiki", "code", "news"}
    assert df.filter(F.col("n_chars") > 0).count() == 500


def test_stream_reader_micro_batches(spark, tmp_path):
    """Micro-batch read of the synthetic source: availableNow drains the
    bounded stream in batch_size steps; the union of all micro-batches
    must equal the batch read exactly (replayable-offset contract)."""
    register_synth_docs(spark)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("synth_docs")
        .option("n_docs", 250)
        .option("batch_size", 100)
        .option("seed", 7)
        .load()
    )
    # Python stream sources don't support Trigger.AvailableNow (Spark
    # falls back to ONE batch) — drain with processAllAvailable instead:
    # offsets stop advancing once n_docs is reached, so it terminates.
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out_dir).orderBy("doc_id").collect()
    want = _read(spark, n_docs=250, n_parts=2, seed=7).orderBy("doc_id").collect()
    assert got == want
