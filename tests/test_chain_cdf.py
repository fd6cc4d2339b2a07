"""Streaming change-data-feed source over append chains
(sources/chain_cdf.py): offset semantics, batch-feed equivalence,
restart idempotence, evolution alignment, and the soundness guards."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryException

from pyspark_big_data_spark.operators.versioned import (
    append_version,
    table_changes,
    write_version,
)
from pyspark_big_data_spark.sources.chain_cdf import (
    ChainCDFStreamReader,
    register_chain_cdf,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("x")
    )


def _run(spark, root, out, ckpt, from_version=0):
    def sink(batch, _bid):
        batch.write.mode("append").parquet(out)

    q = (
        spark.readStream.format("chain_cdf")
        .option("path", root)
        .option("from_version", from_version)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_equals_batch_feed(spark, tmp_path):
    register_chain_cdf(spark)
    root, out, ckpt = (str(tmp_path / d) for d in ("vds", "out", "ckpt"))
    write_version(_df(spark, 0, 100), root)
    append_version(_df(spark, 100, 150), root)
    append_version(_df(spark, 150, 160), root)

    _run(spark, root, out, ckpt)
    got = spark.read.parquet(out)
    want = table_changes(spark, root, 0, 2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_restart_is_idempotent_and_incremental(spark, tmp_path):
    register_chain_cdf(spark)
    root, out, ckpt = (str(tmp_path / d) for d in ("vds", "out", "ckpt"))
    write_version(_df(spark, 0, 50), root)
    append_version(_df(spark, 50, 80), root)

    _run(spark, root, out, ckpt)
    assert spark.read.parquet(out).count() == 30
    _run(spark, root, out, ckpt)  # nothing new: delivers NOTHING
    assert spark.read.parquet(out).count() == 30
    append_version(_df(spark, 80, 90), root)
    _run(spark, root, out, ckpt)  # exactly the new delta
    got = spark.read.parquet(out)
    assert got.count() == 40
    assert sorted(r["k"] for r in got.filter(F.col("k") >= 80).collect()) == list(
        range(80, 90)
    )


def test_default_offset_is_latest_at_open(spark, tmp_path):
    root = str(tmp_path / "vds")
    write_version(_df(spark, 0, 50), root)
    append_version(_df(spark, 50, 80), root)
    reader = ChainCDFStreamReader({"path": root})
    assert reader.initialOffset() == {"version": 1}  # future appends only
    assert reader.latestOffset() == {"version": 1}


def test_full_rewrite_in_range_fails_loudly(spark, tmp_path):
    register_chain_cdf(spark)
    root, out, ckpt = (str(tmp_path / d) for d in ("vds", "out", "ckpt"))
    write_version(_df(spark, 0, 50), root)
    write_version(_df(spark, 0, 10), root)  # full rewrite, not an append
    with pytest.raises(StreamingQueryException, match="full rewrite"):
        _run(spark, root, out, ckpt)


def test_vectored_range_fails_loudly(spark, tmp_path):
    from pyspark_big_data_spark.operators.deletes import delete_keys

    register_chain_cdf(spark)
    root, out, ckpt = (str(tmp_path / d) for d in ("vds", "out", "ckpt"))
    write_version(_df(spark, 0, 50), root)
    v1 = append_version(_df(spark, 50, 60), root)
    delete_keys(spark, root, spark.createDataFrame([(55,)], "k long"), "k", version=v1)
    with pytest.raises(StreamingQueryException, match="deletion vectors"):
        _run(spark, root, out, ckpt)


def test_evolved_chain_streams_full_schema(spark, tmp_path):
    register_chain_cdf(spark)
    root, out, ckpt = (str(tmp_path / d) for d in ("vds", "out", "ckpt"))
    write_version(_df(spark, 0, 50), root)
    append_version(_df(spark, 50, 60), root)  # pre-evolution delta
    append_version(
        _df(spark, 60, 70).withColumn("y", F.lit("new")),
        root,
        allow_evolution=True,
    )
    _run(spark, root, out, ckpt)
    got = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(got.columns) == {"k", "x", "y"}
    assert got.count() == 20
    assert got.filter(F.col("y").isNotNull()).count() == 10


def test_branch_scoped_stream(spark, tmp_path):
    """On a branched table the stream follows its branch's head (the
    CAS log), so another branch's commits neither break the feed nor
    leak into it."""
    from pyspark_big_data_spark.operators.refs import (
        commit_to_branch,
        create_branch,
    )

    register_chain_cdf(spark)
    root, out, ckpt = (str(tmp_path / d) for d in ("vds", "out", "ckpt"))
    write_version(_df(spark, 0, 50), root)
    create_branch(spark, root, "main", 0)
    create_branch(spark, root, "dev", 0)
    commit_to_branch(_df(spark, 100, 120), root, "main", append=True)
    commit_to_branch(_df(spark, 900, 903), root, "dev", append=True)  # noise

    def sink(batch, _bid):
        batch.write.mode("append").parquet(out)

    q = (
        spark.readStream.format("chain_cdf")
        .option("path", root)
        .option("from_version", 0)
        .option("branch", "main")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert sorted(r["k"] for r in got.collect()) == list(range(100, 120))


def test_file_uri_root_streams(spark, tmp_path):
    """The pyarrow.fs seam: a root given as a file:// URI resolves
    through FileSystem.from_uri — the exact code path an s3:// or
    hdfs:// root takes — and serves the same feed as the plain-path
    root."""
    register_chain_cdf(spark)
    root, out, ckpt = (str(tmp_path / d) for d in ("vds", "out", "ckpt"))
    write_version(_df(spark, 0, 50), root)
    append_version(_df(spark, 50, 70), root)

    _run(spark, f"file://{root}", out, ckpt)
    got = spark.read.parquet(out)
    want = table_changes(spark, root, 0, 1)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
