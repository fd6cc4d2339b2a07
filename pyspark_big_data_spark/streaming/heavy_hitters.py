"""Streaming heavy hitters: sharded SpaceSaving sketches in stream state.

The streaming twin of ``queries/text_analysis.py::vocab_heavy_hitters``
(batch: freqItems sketch + exact verify). A stream can't do the exact
second pass, so this is the textbook unbounded-stream design — the
Metwally et-al SpaceSaving sketch, SHARDED by token hash:

- tokens are routed to ``N_SHARDS`` groups by a deterministic hash, so
  each token's full count lands in exactly ONE shard's sketch;
- each shard keeps a capacity-``CAPACITY`` SpaceSaving summary in
  stream state (monitored counts + per-entry overestimate bound) —
  state is O(N_SHARDS x CAPACITY) forever, regardless of stream length;
- the global answer is the UNION of shard summaries (no cross-shard
  merge error — sharding partitions the key space, unlike merging
  sketches that each saw all keys).

Guarantees (per shard, hence globally): any token with true count
greater than shard_stream_len / CAPACITY is present in the summary, and
each reported count overestimates the true count by at most the
reported ``err`` bound. The replay test asserts both against the exact
batch counts.

At 100 TB the stateful shuffle moves raw (shard, token) rows (a
streaming aggregate can't precede another stateful operator), but the
pandas fold collapses each shard-batch to its distinct tokens before
any sketch work — the state store only ever sees CAPACITY counters.

State-compatibility note: shard routing is part of the persisted state
layout. Changing the routing hash (as r8 did, xxhash64 -> the portable
md5-based hash48, so the replay witness can recompute shard thresholds
in DuckDB) reassigns every token to a new shard; resuming an OLD
checkpoint after such a change would silently split each token's count
across its old and new shards. Any routing change therefore requires a
fresh checkpoint directory — never resume existing
applyInPandasWithState state across a hash change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pyspark_big_data_spark.functions import text as TX

N_SHARDS = 16
CAPACITY = 64  # SpaceSaving counters per shard

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("tok", T.StringType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("err", T.LongType()),
    ]
)

# parallel arrays: the sketch content for one shard
STATE_SCHEMA = T.StructType(
    [
        T.StructField("toks", T.ArrayType(T.StringType())),
        T.StructField("cnts", T.ArrayType(T.LongType())),
        T.StructField("errs", T.ArrayType(T.LongType())),
    ]
)


def _space_saving_fold(
    sketch: dict[str, tuple[int, int]], tok: str, add: int
) -> None:
    """Fold ``add`` occurrences of ``tok`` into the sketch in place.

    Classic SpaceSaving: known tokens increment; new tokens evict the
    current minimum, inheriting its count as the overestimate bound."""
    if tok in sketch:
        cnt, err = sketch[tok]
        sketch[tok] = (cnt + add, err)
    elif len(sketch) < CAPACITY:
        sketch[tok] = (add, 0)
    else:
        evict_tok, (evict_cnt, _) = min(sketch.items(), key=lambda kv: (kv[1][0], kv[0]))
        del sketch[evict_tok]
        sketch[tok] = (evict_cnt + add, evict_cnt)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (shard,) = key
    sketch: dict[str, tuple[int, int]] = {}
    if state.exists:
        toks, cnts, errs = state.get
        sketch = {t: (int(c), int(e)) for t, c, e in zip(toks, cnts, errs)}
    for pdf in pdfs:
        # deterministic fold order (token-sorted) so a replayed stream
        # reproduces the same evictions regardless of Arrow batch order
        batch_counts = pdf.groupby("tok")["n"].sum().sort_index()
        for tok, add in batch_counts.items():
            _space_saving_fold(sketch, str(tok), int(add))
    items = sorted(sketch.items())
    state.update(
        ([t for t, _ in items], [c for _, (c, _) in items], [e for _, (_, e) in items])
    )
    yield pd.DataFrame(
        [(shard, t, c, e) for t, (c, e) in items],
        columns=["shard", "tok", "cnt", "err"],
    ).astype({"shard": "int32", "tok": "object", "cnt": "int64", "err": "int64"})


def streaming_heavy_hitters(docs: DataFrame) -> DataFrame:
    """Maintain sharded SpaceSaving summaries over the token stream of
    ``docs`` (any streaming frame with a ``text`` column).

    The map side explodes tokens and routes them by hash shard; the
    stateful update pre-counts each shard-batch per token (pandas
    groupby) and folds the counts into the shard's sketch in
    token-sorted order, so replays reproduce identical evictions."""
    toks = docs.select(F.explode(TX.tokens(F.col("text"))).alias("tok")).select(
        "tok",
        # hash48, not xxhash64: shard routing is part of the sketch's
        # differential contract (the replay witness recomputes per-shard
        # thresholds in DuckDB), so it uses the repo's portable md5-48
        # hash like every other cross-engine key
        (TX.hash48(F.col("tok")) % N_SHARDS).cast("int").alias("shard"),
        F.lit(1).alias("n"),
    )
    return toks.groupBy("shard").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
