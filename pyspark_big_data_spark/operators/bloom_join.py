"""Bloom-filter semi-join reduction (runtime-filter pattern).

The join-side analogue of the per-file Bloom indexes in
operators/versioned.py: when a fact table joins a key set that is too
large to broadcast EXACTLY but whose Bloom filter fits in a few MB, a
membership pre-filter on the fact side cuts the shuffle to
(matching rows + false positives) BEFORE the exact join — the
"runtime filter" / sideways-information-passing every warehouse engine
(and Spark's own runtime bloom rule, when it fires) applies to
selective star joins. At 100 TB the savings is the point: the fact
shuffle shrinks by the join selectivity, for the price of one pass
over the key set and one codegen-adjacent Arrow scan of the fact.

Correctness never depends on the filter: a Bloom has NO false
negatives (every true match survives the pre-filter), and the exact
semi-join afterwards removes the false positives — the filter is a
pure superset pre-cut, same contract as the engine's footer-stats
pruning. That is also why the hash functions here are free to be fast
(vectorized numpy multiply-shift double-hashing, Kirsch-Mitzenmacher
composition) instead of the portable md5 used where an ORACLE must
reproduce positions.

Build cost: one mapInPandas pass over the key side emits one partial
bitmap per partition; the driver ORs them (bounded:
partitions x bits/8 bytes) and broadcasts the result — a distributed
build, no key ever collected.

Integer keys only (the join-key case); sizing is ~16 bits/key rounded
to a power of two (~0.04% fp at k=4), so 100M dim keys need ~200 MB —
the regime where this beats an exact broadcast by 10x+ in memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

_K = 4
_MIN_BITS = 1024
# odd 64-bit multipliers for the two universal hashes
_A1 = np.uint64(0x9E3779B97F4A7C15)
_A2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _hash_pair(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    with np.errstate(over="ignore"):
        x = keys.astype(np.uint64)
        h1 = x * _A1
        h1 ^= h1 >> np.uint64(32)
        h2 = x * _A2
        h2 ^= h2 >> np.uint64(29)
        h2 |= np.uint64(1)  # odd step so all k probes differ
    return h1, h2


def _set_bits(arr: np.ndarray, keys: np.ndarray, bits: int) -> None:
    h1, h2 = _hash_pair(keys)
    mask = np.uint64(bits - 1)
    for i in range(_K):
        pos = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(arr, (pos >> np.uint64(3)).astype(np.int64),
                         (np.uint64(1) << (pos & np.uint64(7))).astype(np.uint8))


def _test_bits(arr: np.ndarray, keys: np.ndarray, bits: int) -> np.ndarray:
    h1, h2 = _hash_pair(keys)
    mask = np.uint64(bits - 1)
    hit = np.ones(len(keys), dtype=bool)
    for i in range(_K):
        pos = (h1 + np.uint64(i) * h2) & mask
        byte = arr[(pos >> np.uint64(3)).astype(np.int64)]
        hit &= (byte & (np.uint64(1) << (pos & np.uint64(7))).astype(np.uint8)) != 0
    return hit


def build_bloom(keys: DataFrame, key_col: str) -> tuple[int, bytes]:
    """Distributed Bloom build over an integer key column. Returns
    (bits, bitmap). Nulls are ignored (null never equi-joins)."""
    n = keys.select(key_col).filter(F.col(key_col).isNotNull()).count()
    bits = _MIN_BITS
    while bits < 16 * max(n, 1):
        bits *= 2

    src = keys.select(F.col(key_col).cast("long").alias("k")).filter(
        F.col("k").isNotNull()
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        arr = np.zeros(bits // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if len(pdf):
                seen = True
                _set_bits(arr, pdf["k"].to_numpy(np.int64), bits)
        if seen:
            yield pd.DataFrame({"bitmap": [arr.tobytes()]})

    parts = src.mapInPandas(partial, schema="bitmap binary").collect()
    merged = np.zeros(bits // 8, dtype=np.uint8)
    for row in parts:  # one row per non-empty partition — bounded
        merged |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return bits, merged.tobytes()


def bloom_prefilter(fact: DataFrame, fact_key: str, bits: int, bitmap: bytes) -> DataFrame:
    """Keep fact rows whose key MIGHT be in the filter (superset cut;
    null keys are dropped — they can never equi-join)."""
    bc = fact.sparkSession.sparkContext.broadcast(bitmap)
    cols = fact.columns

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            keys = pdf[fact_key].to_numpy(np.int64)
            yield pdf[_test_bits(arr, keys, bits)]

    clean = fact.filter(F.col(fact_key).isNotNull()).select(*cols)
    return clean.mapInPandas(probe, schema=clean.schema)


def bloom_probe_counts(
    fact: DataFrame, fact_key: str, bits: int, bitmap: bytes
) -> tuple[int, int]:
    """``(n_fact, n_candidates)`` in ONE key-column pass (r14; guide
    §1.2/§4): per-batch partial counts — total rows, and probe hits
    among non-null keys (exactly ``bloom_prefilter``'s candidate rule)
    — summed by one aggregate. Replaces two separate full-fact counts,
    the second of which shipped every fact column through the Python
    probe just to count survivors."""
    bc = fact.sparkSession.sparkContext.broadcast(bitmap)

    def counts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            k = pdf[fact_key]
            keys = k[k.notna()].to_numpy(np.int64)
            hit = _test_bits(arr, keys, bits)
            yield pd.DataFrame({"n": [len(pdf)], "hits": [int(hit.sum())]})

    row = (
        fact.select(fact_key)
        .mapInPandas(counts, schema="n long, hits long")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("n"),
            F.coalesce(F.sum("hits"), F.lit(0)).alias("hits"),
        )
        .collect()[0]
    )
    return int(row["n"]), int(row["hits"])


def bloom_semi_join(
    fact: DataFrame, fact_key: str, keys: DataFrame, key_col: str
) -> DataFrame:
    """Exact ``fact SEMI JOIN keys``, bloom-reduced: pre-filter the
    fact through the keys' Bloom, then the exact semi-join removes
    false positives. Result is identical to the plain semi-join."""
    bits, bitmap = build_bloom(keys, key_col)
    candidates = bloom_prefilter(fact, fact_key, bits, bitmap)
    return candidates.join(
        keys.select(F.col(key_col).alias(fact_key)).distinct(), fact_key, "leftsemi"
    )
