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


# ---------------------------------------------------------------------------
# TYPED mode (r13): streaming a MUTATING chain as _change_type rows.
# ---------------------------------------------------------------------------


def _run_typed(spark, root, out, ckpt, from_version=0):
    def sink(batch, _bid):
        batch.write.mode("append").parquet(out)

    q = (
        spark.readStream.format("chain_cdf")
        .option("path", root)
        .option("from_version", from_version)
        .option("change_types", "typed")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _mutating_chain(spark, root):
    """v0 base, v1 append, v2 MERGE, v3 update_where, v4 delete_where."""
    from pyspark_big_data_spark.operators.merge import (
        delete_where,
        merge_into,
        update_where,
    )

    def mk(lo, hi):
        return spark.createDataFrame(
            [(i, f"u{i}", float(i * 10)) for i in range(lo, hi)],
            "k int, name string, val double",
        )

    write_version(mk(0, 20), root)
    append_version(mk(20, 25), root)
    src = spark.createDataFrame(
        [(i, f"upd{i}", float(i * 100)) for i in range(8)]
        + [(i, f"new{i}", float(i)) for i in (30, 31)],
        "k int, name string, val double",
    )
    merge_into(
        spark,
        root,
        src,
        "k",
        when_matched_update="source.k < 5",
        when_matched_delete="source.k >= 5",
        when_not_matched_insert=True,
    )
    update_where(spark, root, {"val": "val + 1000"}, "k >= 20 AND k < 23")
    return delete_where(spark, root, "k = 24")["version"]


def test_typed_stream_serves_merge_maintained_chain(spark, tmp_path):
    """The r12-verdict gap: a table maintained by MERGE can be streamed
    downstream — typed rows, folding bit-exactly to the MOR head."""
    from pyspark_big_data_spark.operators.cdf import fold_changes
    from pyspark_big_data_spark.operators.deletes import read_version_mor
    from pyspark_big_data_spark.operators.versioned import read_version

    register_chain_cdf(spark)
    root, out, ckpt = (str(tmp_path / d) for d in ("vds", "out", "ckpt"))
    head_v = _mutating_chain(spark, root)

    _run_typed(spark, root, out, ckpt)
    got = spark.read.parquet(out)
    counts = {
        (r["_commit_version"], r["_change_type"]): r["n"]
        for r in got.groupBy("_commit_version", "_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # the MERGE commit (v2) streams the keyless changeset; the marked
    # row mutations (v3/v4) stream exact update/delete typing
    # v2's MERGE: 5 updates + 3 deletes retire 8 rows; its delta is
    # 5 update rows + 2 inserts = 7 adds, streamed as the changeset
    assert counts == {
        (1, "insert"): 5,
        (2, "insert"): 7,
        (2, "delete"): 8,
        (3, "update_postimage"): 3,
        (3, "update_preimage"): 3,
        (4, "delete"): 1,
    }
    folded = fold_changes(read_version(spark, root, 0), got)
    head = read_version_mor(spark, root, head_v)
    assert folded.exceptAll(head).count() == 0
    assert head.exceptAll(folded).count() == 0


def test_typed_stream_restart_is_idempotent(spark, tmp_path):
    from pyspark_big_data_spark.operators.merge import merge_into

    register_chain_cdf(spark)
    root, out, ckpt = (str(tmp_path / d) for d in ("vds", "out", "ckpt"))
    _mutating_chain(spark, root)

    _run_typed(spark, root, out, ckpt)
    n = spark.read.parquet(out).count()
    _run_typed(spark, root, out, ckpt)  # nothing new: delivers NOTHING
    assert spark.read.parquet(out).count() == n
    # a further MERGE streams exactly its own change rows
    merge_into(
        spark,
        root,
        spark.createDataFrame([(0, "z", 0.0)], "k int, name string, val double"),
        "k",
    )
    _run_typed(spark, root, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == n + 2  # delete + insert of the keyless changeset
    assert sorted(
        r["_change_type"]
        for r in got.filter(F.col("_commit_version") == 5).collect()
    ) == ["delete", "insert"]


def test_adds_mode_still_refuses_vector_bearing_range(spark, tmp_path):
    """The adds-only contract is unchanged — but the refusal now names
    the typed escape hatch."""
    from pyspark_big_data_spark.operators.merge import merge_into

    register_chain_cdf(spark)
    root, out, ckpt = (str(tmp_path / d) for d in ("vds", "out", "ckpt"))
    write_version(_df(spark, 0, 50), root)
    merge_into(
        spark,
        root,
        spark.createDataFrame([(1, 99.0)], "k long, x double"),
        "k",
    )
    with pytest.raises(StreamingQueryException, match="change_types"):
        _run(spark, root, out, ckpt)


def test_typed_stream_refuses_external_vectors(spark, tmp_path):
    from pyspark_big_data_spark.operators.deletes import delete_keys

    register_chain_cdf(spark)
    root, out, ckpt = (str(tmp_path / d) for d in ("vds", "out", "ckpt"))
    write_version(_df(spark, 0, 50), root)
    v1 = append_version(_df(spark, 50, 60), root)
    delete_keys(
        spark, root, spark.createDataFrame([(55,)], "k long"), "k", version=v1
    )
    with pytest.raises(StreamingQueryException, match="EXTERNAL deletion"):
        _run_typed(spark, root, out, ckpt)


def test_typed_stream_equals_batch_typed_feed(spark, tmp_path):
    """Stream rows == batch table_changes_typed rows (modulo the MERGE
    commit's changeset-vs-paired typing: compare with pairing folded
    down to the changeset view)."""
    from pyspark_big_data_spark.operators.cdf import table_changes_typed

    register_chain_cdf(spark)
    root, out, ckpt = (str(tmp_path / d) for d in ("vds", "out", "ckpt"))
    head_v = _mutating_chain(spark, root)
    _run_typed(spark, root, out, ckpt)
    got = spark.read.parquet(out)
    want = table_changes_typed(spark, root, 0, head_v)
    # project pairing down to adds/removes: both surfaces must agree on
    # WHAT changed even where the stream's typing is coarser
    def changeset(df):
        return df.withColumn(
            "_op",
            F.when(
                F.col("_change_type").isin("insert", "update_postimage"),
                F.lit("add"),
            ).otherwise(F.lit("remove")),
        ).drop("_change_type")

    a, b = changeset(got), changeset(want)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_typed_stream_branch_scoped(spark, tmp_path):
    """Typed mode composes with branch scoping: the stream follows its
    branch's MERGE commits and another branch's mutations neither
    break the feed nor leak into it."""
    from pyspark_big_data_spark.operators.merge import merge_to_branch
    from pyspark_big_data_spark.operators.refs import create_branch

    register_chain_cdf(spark)
    root, out, ckpt = (str(tmp_path / d) for d in ("vds", "out", "ckpt"))
    write_version(_df(spark, 0, 20), root)
    create_branch(spark, root, "main", 0)
    create_branch(spark, root, "dev", 0)
    merge_to_branch(
        spark, root, "main",
        spark.createDataFrame([(1, 111.0), (100, 1.0)], "k long, x double"),
        "k",
    )
    merge_to_branch(  # noise on the other branch
        spark, root, "dev",
        spark.createDataFrame([(2, 999.0)], "k long, x double"),
        "k",
    )

    def sink(batch, _bid):
        batch.write.mode("append").parquet(out)

    q = (
        spark.readStream.format("chain_cdf")
        .option("path", root)
        .option("from_version", 0)
        .option("branch", "main")
        .option("change_types", "typed")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    rows = {(r["k"], r["_change_type"]) for r in got.collect()}
    # main's changeset only: update of k=1 (delete+insert) + insert 100
    assert rows == {(1, "delete"), (1, "insert"), (100, "insert")}
    assert got.filter(F.col("x") == 999.0).count() == 0  # no dev leak
