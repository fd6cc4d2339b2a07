"""Streaming correctness: a full replay of the events table through
Structured Streaming must equal the batch event-time queries."""

from __future__ import annotations

from pyspark_big_data_spark.queries.event_windows import tumbling_window_agg
from pyspark_big_data_spark.streaming import stateful, streams


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_tumbling_equals_batch(spark, sf_dir):
    ev = streams.stream_events(spark, sf_dir)
    got = streams.run_to_memory(streams.tumbling_counts(ev), "t_tumbling")
    want = tumbling_window_agg(spark, sf_dir)
    cols = ["window_start", "event_type", "cnt", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_session_windows_run(spark, sf_dir):
    ev = streams.stream_events(spark, sf_dir)
    got = streams.run_to_memory(streams.session_counts(ev), "t_sessions")
    rows = got.collect()
    assert len(rows) > 0
    # sessions are disjoint per user and n_events sums to the event count
    total = sum(r["n_events"] for r in rows)
    assert total == spark.read.parquet(f"{sf_dir}/events.parquet").count()


def test_stream_sessions_equal_batch_sessionization(spark, sf_dir):
    """The streaming session_window and the batch lag/cumsum
    sessionization must produce the same (user, start, n_events) sets."""
    from pyspark_big_data_spark.queries.event_windows import session_window_agg

    ev = streams.stream_events(spark, sf_dir)
    got = streams.run_to_memory(streams.session_counts(ev), "t_sessions_cmp")
    stream_set = {
        (r["user_id"], r["session_start"], r["n_events"]) for r in got.collect()
    }
    batch_set = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in session_window_agg(spark, sf_dir).collect()
    }
    assert stream_set == batch_set


def test_foreach_batch_checkpointed_sink(spark, sf_dir, tmp_path):
    """Production-sink shape: foreachBatch -> parquet with a checkpoint.
    A second run from the same checkpoint must be a no-op (no duplicate
    micro-batches) — exactly-once at the sink level."""
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def write_batch(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    def run_once():
        ev = streams.stream_events(spark, sf_dir)
        q = (
            streams.tumbling_counts(ev)
            .writeStream.outputMode("complete")
            .foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out_dir).count()
    batch_n = tumbling_window_agg(spark, sf_dir).count()
    assert n1 == batch_n
    run_once()  # same checkpoint: source exhausted, nothing re-emitted
    assert spark.read.parquet(out_dir).count() == n1


def test_stateful_running_user_stats(spark, sf_dir):
    ev = streams.stream_events(spark, sf_dir)
    got = streams.run_to_memory(stateful.running_user_stats(ev), "t_stateful", output_mode="update")
    import pyspark.sql.functions as F

    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
    )
    want = {r["user_id"]: (r["n"], round(r["mx"], 9)) for r in batch.collect()}
    # update mode may emit a row per micro-batch; the final row per user wins
    final = {}
    for r in got.collect():
        final[r["user_id"]] = (r["n_events"], round(r["max_value"], 9))
    assert final == want


def test_stream_dedup_within_watermark_equals_batch_key_set(spark, sf_dir):
    """Streaming dropDuplicatesWithinWatermark: one surviving row per
    (user_id, event_type) key; the key SET equals batch distinct (the
    surviving row itself is arrival-order-dependent, not part of the
    contract)."""
    ev = streams.stream_events(spark, sf_dir)
    got = streams.run_to_memory(
        streams.deduped_events(ev), "t_dedup", output_mode="append"
    )
    stream_keys = [(r["user_id"], r["event_type"]) for r in got.collect()]
    assert len(stream_keys) == len(set(stream_keys)), "duplicate keys survived"
    batch_keys = {
        (r["user_id"], r["event_type"])
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert set(stream_keys) == batch_keys


def test_stream_jsonl_ingestion_equals_batch(spark, sf_dir, tmp_path):
    # land the documents table as JSONL shards, then stream-ingest them:
    # a count-by-lang over the stream must equal the batch aggregate
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.io import read_table, write_jsonl
    from pyspark_big_data_spark.streaming.streams import run_to_memory, stream_jsonl

    docs = read_table(spark, sf_dir, "documents")
    path = str(tmp_path / "jsonl_drop")
    write_jsonl(docs, path, shards=3)

    stream = stream_jsonl(spark, path, docs.schema)
    agg = stream.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    got = {
        (r["lang"], r["cnt"])
        for r in run_to_memory(agg, "jsonl_ingest", output_mode="complete").collect()
    }
    want = {
        (r["lang"], r["cnt"])
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got == want


def test_stream_corpus_ingest_equals_batch_pipeline(spark, sf_dir, tmp_path):
    """Continuous-ingestion twin: replaying the documents table as JSONL
    drops through quality-gate + watermarked exact dedup must keep
    exactly the batch pipeline's survivor fingerprint set (the surviving
    doc per fingerprint is arrival-order-dependent by definition, so the
    fingerprint set is the contract)."""
    import json as _json

    from pyspark.sql import functions as F

    from pyspark_big_data_spark.functions import text as TX
    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.queries.training_pipeline import curated_training_set
    from pyspark_big_data_spark.streaming.corpus_ingest import ingest_corpus_stream
    from pyspark_big_data_spark.streaming.streams import run_to_memory

    docs = read_table(spark, sf_dir, "documents").collect()
    drop_dir = tmp_path / "drops"
    drop_dir.mkdir()
    # two shards + one corrupt line; ingest_ts within one watermark window
    for shard in range(2):
        with open(drop_dir / f"shard{shard}.jsonl", "w") as fh:
            if shard == 0:
                fh.write("{not json\n")
            for r in docs[shard::2]:
                fh.write(
                    _json.dumps(
                        {
                            "doc_id": r["doc_id"],
                            "text": r["text"],
                            "lang": r["lang"],
                            "source": r["source"],
                            "ingest_ts": "2024-01-01T00:00:01",
                        }
                    )
                    + "\n"
                )

    out = run_to_memory(
        ingest_corpus_stream(spark, str(drop_dir)), "corpus_ingest", output_mode="append"
    )
    stream_fps = {r["fp"] for r in out.select("fp").collect()}

    batch = curated_training_set(spark, sf_dir)
    batch_fps = {
        r["fp"]
        for r in read_table(spark, sf_dir, "documents")
        .join(batch.select("doc_id"), "doc_id")
        .select(TX.fingerprint(F.col("text")).alias("fp"))
        .collect()
    }
    assert stream_fps == batch_fps
    assert len(out.columns) == 6


def test_incremental_dedup_stream_equals_full_recompute(spark, sf_dir, tmp_path):
    """Replaying the corpus through the continuous-dedup loop in 3
    micro-batches must produce EXACTLY the full-recompute pair set —
    regardless of how documents are partitioned into batches — and the
    index must end up covering every document once."""
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.queries.dedup import dedup_minhash_lsh
    from pyspark_big_data_spark.streaming.incremental_dedup import process_document_batch

    docs = read_table(spark, sf_dir, "documents")
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")

    for shard in range(3):
        process_document_batch(
            docs.filter(F.col("doc_id") % 3 == shard), index_dir, pairs_dir=pairs_dir
        )

    got = {
        (r["id_a"], r["id_b"]) for r in spark.read.parquet(pairs_dir).collect()
    }
    want = {(r["id_a"], r["id_b"]) for r in dedup_minhash_lsh(spark, sf_dir).collect()}
    assert got == want

    n_docs = docs.count()
    assert spark.read.parquet(f"{index_dir}/sigs").count() == n_docs


def test_incremental_dedup_stream_via_foreachbatch(spark, sf_dir, tmp_path):
    """End-to-end through the Structured Streaming wiring: JSONL drops ->
    foreachBatch incremental step -> pairs sink; the cumulative pair set
    matches the batch-path replay on the same docs."""
    import json as _json

    from pyspark.sql import types as T

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.streaming.incremental_dedup import run_dedup_stream

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    drop_dir = tmp_path / "drops"
    drop_dir.mkdir()
    with open(drop_dir / "all.jsonl", "w") as fh:
        for r in docs:
            fh.write(_json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")

    q = run_dedup_stream(
        spark,
        str(drop_dir),
        schema,
        index_dir=str(tmp_path / "index"),
        pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    from pyspark_big_data_spark.queries.dedup import dedup_minhash_lsh

    got = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(str(tmp_path / "pairs")).collect()}
    want = {(r["id_a"], r["id_b"]) for r in dedup_minhash_lsh(spark, sf_dir).collect()}
    assert got == want


def test_incremental_dedup_stream_multibatch_and_restart_idempotent(spark, sf_dir, tmp_path):
    """Operational contract of the continuous-dedup loop: (1) with
    maxFilesPerTrigger=1 each shard becomes its OWN micro-batch and the
    cumulative pair set still equals the full recompute; (2) restarting
    the stream against the same checkpoint reprocesses nothing — the
    pair sink and index are unchanged (source-offset idempotence)."""
    import json as _json

    from pyspark.sql import types as T

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.queries.dedup import dedup_minhash_lsh
    from pyspark_big_data_spark.streaming.incremental_dedup import run_dedup_stream

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    drop_dir = tmp_path / "drops"
    drop_dir.mkdir()
    for shard in range(3):
        with open(drop_dir / f"s{shard}.jsonl", "w") as fh:
            for r in docs[shard::3]:
                fh.write(_json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")

    args = dict(
        index_dir=str(tmp_path / "index"),
        pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    run_dedup_stream(spark, str(drop_dir), schema, **args).awaitTermination()

    def pairs():
        return sorted(
            (r["id_a"], r["id_b"]) for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
        )

    want = sorted((r["id_a"], r["id_b"]) for r in dedup_minhash_lsh(spark, sf_dir).collect())
    first = pairs()
    assert first == want
    n_index = spark.read.parquet(str(tmp_path / "index") + "/sigs").count()
    assert n_index == len(docs)

    # restart against the same checkpoint: nothing new to process
    run_dedup_stream(spark, str(drop_dir), schema, **args).awaitTermination()
    assert pairs() == first
    assert spark.read.parquet(str(tmp_path / "index") + "/sigs").count() == n_index


def test_incremental_dedup_corrupted_index_fails_batch(spark, sf_dir, tmp_path):
    """A corrupted (non-missing) index must FAIL the batch, never be
    silently treated as empty: a swallowed read error here would drop
    old x new duplicate pairs — the one thing this component exists to
    never do. Only a genuinely absent path means 'first batch'."""
    import pytest
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.streaming.incremental_dedup import process_document_batch

    docs = read_table(spark, sf_dir, "documents")
    index_dir = str(tmp_path / "index")
    process_document_batch(docs.filter(F.col("doc_id") % 3 == 0), index_dir)

    # Corrupt every part file of the signature index in place.
    sigs_dir = tmp_path / "index" / "sigs"
    parts = list(sigs_dir.glob("part-*.parquet"))
    assert parts, "expected parquet part files in the index"
    for p in parts:
        p.write_bytes(b"not a parquet file")

    with pytest.raises(Exception):
        process_document_batch(docs.filter(F.col("doc_id") % 3 == 1), index_dir)


def test_incremental_dedup_returned_handle_is_materialized(spark, sf_dir, tmp_path):
    """The DataFrame returned by process_document_batch (pairs_dir set)
    must be usable AFTER the call without re-reading the now-mutated
    index: re-collecting it post-append must equal the pairs-sink rows
    for that batch, with no duplicated join output."""
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.streaming.incremental_dedup import process_document_batch

    docs = read_table(spark, sf_dir, "documents")
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")

    process_document_batch(docs.filter(F.col("doc_id") % 2 == 0), index_dir, pairs_dir=pairs_dir)
    sink_before = spark.read.parquet(pairs_dir).count()
    ret = process_document_batch(
        docs.filter(F.col("doc_id") % 2 == 1), index_dir, pairs_dir=pairs_dir
    )
    batch2_sink = spark.read.parquet(pairs_dir).count() - sink_before

    # Collected AFTER both appends landed — a lazy plan would re-join
    # with batch-2 docs on both sides and inflate/duplicate rows.
    got = sorted((r["id_a"], r["id_b"]) for r in ret.collect())
    assert len(got) == batch2_sink
    assert len(set(got)) == len(got)


def test_stream_stream_attribution_join_equals_batch(spark, sf_dir):
    """The stream-stream interval join replayed over the events table
    must produce exactly the batch attribution pairs (append mode —
    stream-stream inner joins emit once per matched pair)."""
    from pyspark_big_data_spark.queries.event_windows import click_purchase_attribution
    from pyspark_big_data_spark.streaming import stream_join
    from pyspark_big_data_spark.streaming.streams import run_to_memory

    got_df = run_to_memory(
        stream_join.attribution_stream(spark, sf_dir),
        "t_attr_join",
        output_mode="append",
    )
    got = {
        (r["click_id"], r["purchase_id"], r["user_id"], r["gap_s"])
        for r in got_df.collect()
    }
    want = {
        (r["click_id"], r["purchase_id"], r["user_id"], r["gap_s"])
        for r in click_purchase_attribution(spark, sf_dir).collect()
    }
    assert got == want
    assert want  # non-degenerate: attributions exist in the fixture


def test_stream_stream_attribution_restart_idempotent(spark, sf_dir, tmp_path):
    """Re-running the checkpointed attribution stream must not re-emit
    pairs: the processed-files log in the checkpoint makes the replay a
    no-op, so the sink matches the batch result after ANY number of
    restarts."""
    from pyspark_big_data_spark.queries.event_windows import click_purchase_attribution
    from pyspark_big_data_spark.streaming.stream_join import run_attribution_stream

    out, ckpt = str(tmp_path / "attr_out"), str(tmp_path / "attr_ckpt")
    run_attribution_stream(spark, sf_dir, out, ckpt)
    run_attribution_stream(spark, sf_dir, out, ckpt)  # restart: no-op

    got = {
        (r["click_id"], r["purchase_id"]) for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["click_id"], r["purchase_id"])
        for r in click_purchase_attribution(spark, sf_dir).collect()
    }
    assert got == want


def test_rate_source_smoke(spark):
    """Source-matrix breadth: the rate-micro-batch source (deterministic
    rows per batch) drives the same transformation surface as the file
    sources — no fixture files needed."""
    df = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 50)
        .option("numPartitions", 2)
        .load()
    )
    from pyspark.sql import functions as F

    agg = df.groupBy((F.col("value") % 5).alias("bucket")).count()
    q = (
        agg.writeStream.format("memory")
        .queryName("t_rate_smoke")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r["bucket"]: r["count"] for r in spark.table("t_rate_smoke").collect()}
    assert sum(rows.values()) == 50
    assert set(rows) == set(range(5))


def test_streaming_anomalies_equal_batch_bitwise(spark, sf_dir, tmp_path):
    """Stateful z-score stream == batch expanding-window twin, bit-for-bit:
    events are dropped as 3 CHRONOLOGICAL parquet shards (the contract —
    cross-batch late data is the documented trade), each its own
    micro-batch; the integer-scaled decimal state must reproduce the
    batch DECIMAL(30,8) sums exactly, so event ids, n_prior AND the
    rounded z values all match."""
    import os

    from pyspark_big_data_spark.queries.event_windows import event_value_anomalies
    from pyspark_big_data_spark.streaming.anomaly import streaming_anomalies
    from pyspark_big_data_spark.streaming.streams import run_to_memory

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = events.orderBy("ts", "event_id").collect()
    drop_dir = tmp_path / "evdrops"
    drop_dir.mkdir()
    cut = len(rows) // 3
    for shard, lo in enumerate(range(0, len(rows), cut + 1)):
        path = str(drop_dir / f"d{shard}.parquet")
        spark.createDataFrame(rows[lo : lo + cut + 1], events.schema).coalesce(
            1
        ).write.mode("overwrite").parquet(path)
        # file-source ordering is by modification time: pin it explicitly
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (1_000_000 + shard, 1_000_000 + shard))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(drop_dir))
    )
    got = run_to_memory(streaming_anomalies(stream), "t_anom", output_mode="append")
    stream_rows = sorted(
        (r["event_id"], r["user_id"], r["value"], r["n_prior"], r["z"])
        for r in got.collect()
    )
    want = sorted(
        (r["event_id"], r["user_id"], r["value"], r["n_prior"], r["z"])
        for r in event_value_anomalies(spark, sf_dir).collect()
    )
    assert stream_rows == want


def test_streaming_heavy_hitters_space_saving(spark, sf_dir, tmp_path):
    """Sharded SpaceSaving sketches over a replayed token stream:
    (a) every token whose true count exceeds its shard's
        stream_len/CAPACITY guarantee threshold is present;
    (b) every reported count respects the cnt - err <= true bound;
    (c) never-evicted entries (err == 0) never overcount."""
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.functions import text as TX
    from pyspark_big_data_spark.io import read_table, write_jsonl
    from pyspark_big_data_spark.streaming import heavy_hitters as HH
    from pyspark_big_data_spark.streaming.streams import run_to_memory

    docs = read_table(spark, sf_dir, "documents")
    path = str(tmp_path / "hh_drop")
    write_jsonl(docs, path, shards=3)

    # one file per micro-batch so sketch state must carry across batches
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .json(path)
    )
    got = run_to_memory(
        HH.streaming_heavy_hitters(stream), "t_hh", output_mode="update"
    ).collect()
    # update mode re-emits the full shard sketch each batch: the latest
    # emission per (shard, tok) is the max-cnt row (counts are monotone
    # while a token stays resident; a re-entering token inherits >= its
    # prior count)
    final: dict[tuple[int, str], tuple[int, int]] = {}
    for r in got:
        k = (r["shard"], r["tok"])
        if k not in final or r["cnt"] > final[k][0]:
            final[k] = (r["cnt"], r["err"])

    true_counts = {
        (r["shard"], r["tok"]): r["cnt"]
        for r in docs.select(F.explode(TX.tokens(F.col("text"))).alias("tok"))
        .select("tok", (TX.hash48(F.col("tok")) % HH.N_SHARDS).cast("int").alias("shard"))
        .groupBy("shard", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    shard_len: dict[int, int] = {}
    for (shard, _), c in true_counts.items():
        shard_len[shard] = shard_len.get(shard, 0) + c

    # (a) SpaceSaving containment guarantee, per shard
    missed = [
        (s, t, c)
        for (s, t), c in true_counts.items()
        if c > shard_len[s] / HH.CAPACITY and (s, t) not in final
    ]
    assert not missed, f"guaranteed heavy hitters missing from sketch: {missed[:5]}"

    # (b) error bound; (c) exactness of never-evicted entries
    for (s, t), (cnt, err) in final.items():
        true = true_counts.get((s, t), 0)
        assert cnt - err <= true, f"{t}: cnt={cnt} err={err} true={true}"
        if err == 0:
            assert cnt <= true, f"{t}: exact entry overcounts (cnt={cnt} true={true})"


def test_scd2_incremental_equals_batch_derivation(spark, sf_dir, tmp_path):
    """Replaying orders in date-ordered batches through the SCD2
    maintenance loop yields the dimension the one-shot batch query
    derives — row-for-row, including closed-interval stamps and
    is_current flags."""
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.queries.dimension import scd2_customer_priority
    from pyspark_big_data_spark.streaming import scd2_maintain as SM

    orders = read_table(spark, sf_dir, "orders")
    # three date-ordered batches split at fixed calendar cuts
    dim_dir = str(tmp_path / "scd2_dim")
    splits = [
        orders.filter(F.col("o_orderdate") < "1995-01-01"),
        orders.filter(
            (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
        ),
        orders.filter(F.col("o_orderdate") >= "1997-01-01"),
    ]
    for batch in splits:
        SM.process_order_batch(batch, dim_dir)

    got = {
        tuple(r)
        for r in SM.scd2_report(spark, dim_dir)
        .select("c_custkey", "version", "priority", "valid_from", "valid_to", "is_current", "n_orders")
        .collect()
    }
    want = {
        tuple(r)
        for r in scd2_customer_priority(spark, sf_dir)
        .select("c_custkey", "version", "priority", "valid_from", "valid_to", "is_current", "n_orders")
        .collect()
    }
    assert got == want


def test_scd2_stream_foreachbatch_runs(spark, sf_dir, tmp_path):
    """End-to-end foreachBatch wiring: orders landed as parquet drops,
    streamed with availableNow into the maintenance loop."""
    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.streaming import scd2_maintain as SM

    orders = read_table(spark, sf_dir, "orders")
    drop_dir = str(tmp_path / "order_drops")
    orders.coalesce(2).write.mode("overwrite").parquet(drop_dir)
    dim_dir = str(tmp_path / "scd2_dim_stream")
    stream = spark.readStream.schema(orders.schema).parquet(drop_dir)
    q = SM.run_scd2_stream(stream, dim_dir, str(tmp_path / "ckpt"))
    q.awaitTermination()
    report = SM.scd2_report(spark, dim_dir)
    # one open version per customer with >= 1 order
    n_cust = orders.select("o_custkey").distinct().count()
    assert report.filter("is_current = 1").count() == n_cust
    assert report.groupBy("c_custkey", "version").count().filter("count > 1").count() == 0


def test_ivm_incremental_equals_direct_aggregate(spark, sf_dir, tmp_path):
    """Folding lineitem in 3 arbitrary hash batches through the IVM loop
    reproduces revenue_by_nation's one-shot aggregate bit-for-bit
    (decimal-exact running sums make batching invisible)."""
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.queries.analytics import revenue_by_nation
    from pyspark_big_data_spark.streaming import ivm

    li = read_table(spark, sf_dir, "lineitem")
    view_dir = str(tmp_path / "rev_view")
    for i in range(3):
        ivm.fold_revenue_batch(
            li.filter(F.abs(F.xxhash64("l_orderkey")) % 3 == i), view_dir, sf_dir
        )

    got = [tuple(r) for r in ivm.revenue_report(spark, view_dir).collect()]
    want = [
        tuple(r)
        for r in revenue_by_nation(spark, sf_dir)
        .select("n_name", "revenue", "n_items")
        .collect()
    ]
    assert got == want


def test_ivm_stream_foreachbatch_runs(spark, sf_dir, tmp_path):
    """End-to-end wiring: lineitem landed as parquet drops, streamed
    with availableNow through the IVM fold."""
    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.queries.analytics import revenue_by_nation
    from pyspark_big_data_spark.streaming import ivm

    li = read_table(spark, sf_dir, "lineitem")
    drop_dir = str(tmp_path / "li_drops")
    li.coalesce(2).write.mode("overwrite").parquet(drop_dir)
    view_dir = str(tmp_path / "rev_view_stream")
    stream = spark.readStream.schema(li.schema).parquet(drop_dir)
    q = ivm.run_ivm_stream(stream, view_dir, sf_dir, str(tmp_path / "ivm_ckpt"))
    q.awaitTermination()
    got = [tuple(r) for r in ivm.revenue_report(spark, view_dir).collect()]
    want = [
        tuple(r)
        for r in revenue_by_nation(spark, sf_dir)
        .select("n_name", "revenue", "n_items")
        .collect()
    ]
    assert got == want


def test_stream_static_enrichment_with_observe(spark, sf_dir):
    """Stream-static dimension join + observe() pipeline metrics: the
    enriched stream must match the batch join per segment, and the
    observed listener metrics must account for every source event."""
    from pyspark.sql import functions as F

    got = streams.run_to_memory(
        streams.enriched_events(streams.stream_events(spark, sf_dir), sf_dir)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n")),
        "t_enrich",
        output_mode="complete",
    )
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/customer.parquet").select(
                F.col("c_custkey").alias("user_id"), "c_mktsegment"
            ),
            "user_id",
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r["c_mktsegment"], r["n"]) for r in got.collect()} == {
        (r["c_mktsegment"], r["n"]) for r in batch.collect()
    }


def test_watermark_drops_late_events_beyond_delay(spark, tmp_path):
    """Pins the watermark CONTRACT, not just stream==batch agreement:
    an event arriving after the watermark passed its window's end is
    DROPPED (its finalized window count excludes it), while in-order
    data keeps flowing. Batch boundaries are controlled by dropping one
    parquet file per micro-batch (maxFilesPerTrigger=1 +
    processAllAvailable between drops)."""
    import datetime as dt

    from pyspark.sql import types as T

    from pyspark_big_data_spark.streaming.streams import tumbling_counts

    def t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    sch = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    drops = tmp_path / "drops"
    drops.mkdir()

    def drop(name, rows):
        spark.createDataFrame(rows, sch).coalesce(1).write.parquet(str(drops / name))

    # batch 1: three in-window events + one at 12:30 that will advance
    # the 1-hour watermark to 11:30 (past the 10:00 window's end)
    drop("b1", [(t(10, 5), "click", 1.0), (t(10, 20), "click", 1.0),
                (t(10, 40), "click", 1.0), (t(12, 30), "click", 1.0)])

    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(drops))
    )
    q = (
        tumbling_counts(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("late_drop_test")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE event for the already-finalized 10:00 window
        # (must be dropped) + an in-order event at 12:40
        drop("b2", [(t(10, 15), "click", 1.0), (t(12, 40), "click", 1.0)])
        q.processAllAvailable()
        # batch 3: advance the watermark past 13:00 to flush the 12:00 window
        drop("b3", [(t(15, 0), "click", 1.0)])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {r["window_start"]: r["cnt"] for r in spark.sql(
        "SELECT window_start, cnt FROM late_drop_test"
    ).collect()}
    # 10:00 window finalized WITHOUT the late 10:15 arrival
    assert rows.get("2024-01-01 10:00:00") == 3, rows
    # in-order events kept flowing: 12:00 window has both 12:30 and 12:40
    assert rows.get("2024-01-01 12:00:00") == 2, rows


def test_streaming_replay_witness_digest(spark, sf_dir):
    """The driver-surface digest of the micro-batch replay: all three
    counts equal (streamed set == full recompute, estimator-exact) and
    the oracle is registered so the row is driver-verifiable."""
    from pyspark_big_data_spark.queries import ORACLES
    from pyspark_big_data_spark.queries.stream_witness import (
        streaming_dedup_replay_witness,
    )

    row = streaming_dedup_replay_witness(spark, sf_dir).collect()[0]
    assert row["n_full"] > 0
    assert row["n_stream"] == row["n_full"]
    assert row["n_agreeing"] == row["n_full"]
    assert "streaming_dedup_replay_witness" in ORACLES
