#!/usr/bin/env python
"""Generate a NATIVE synthetic dataset at an arbitrary scale factor —
fresh keys, fresh text, fresh vectors — with the driver testdata's
schemas, cardinality ratios, and planted-similarity structure
(VERDICT r2 #10 / r3 #8: the 10x replication stress in
make_scale_data.py preserves distributions but makes dedup workloads
see cross-copy near-dup artifacts; this generator has none, so stress
ratios at sf1+ measure the engine, not the replication trick).

Deliberately NOT the driver's generator: row values differ (different
RNG), only the shape contract is reproduced —

- cardinalities: customer 150k/sf, supplier 10k/sf, part 200k/sf,
  orders 10x customer, lineitem 4x orders, events 1M/sf over 15k/sf
  users (a subset of custkeys — reshaping joins user_id = o_custkey),
  documents 50k/sf (min 500), embeddings 20k/sf (min 500);
- key referential integrity: l_orderkey ⊆ o_orderkey,
  o_custkey ⊆ c_custkey, lineitem part/supp keys ⊆ part/supplier;
- planted near-dup structure: ~8%% of documents are token-mutated
  copies of an earlier doc (shingle Jaccard lands around the MinHash
  detection band), ~5%% of embeddings are cosine-correlated pairs in
  the 0.40-0.75 band the near-dup queries look for;
- encodings: timestamps written as timestamp[us] (the driver's current
  on-disk encoding), embeddings float32 lists.

    python tools/make_native_data.py [sf] [dst_dir] [seed]

sf=1 lands ~6M lineitem / 1M events / 50k docs / 20k vectors.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "the a key agg row scan slow fast table value part hash merge batch window "
    "order data column join small line customer query group big vector filter "
    "sort stream spark"
).split()

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUS = ["O", "F", "P"]
RFLAG = ["N", "A", "R"]
ETYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "en", "en", "en", "de", "es", "fr", "zh"]  # en-heavy like the driver data
COLORS = ["red", "green", "blue", "plum", "ivory", "small", "large", "shiny"]
NOUNS = ["widget", "bolt", "ring", "gear", "cog", "pin", "cap", "rod"]
PTYPES = ["ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO"]


def _ts_us(days_float: np.ndarray, epoch: str) -> pa.Array:
    base = np.datetime64(epoch, "us")
    return pa.array(base + (days_float * 86_400_000_000).astype("int64"), type=pa.timestamp("us"))


def make(sf: float, dst: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(dst, exist_ok=True)

    def write(name, **cols):
        t = pa.table(cols)
        pq.write_table(t, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows")

    n_cust = max(150, int(150_000 * sf))
    n_supp = max(10, int(10_000 * sf))
    n_part = max(200, int(200_000 * sf))
    n_ord = 10 * n_cust
    n_li = 4 * n_ord
    n_ev = max(1000, int(1_000_000 * sf))
    n_users = max(15, int(15_000 * sf))
    n_doc = max(500, int(50_000 * sf))
    n_vec = max(500, int(20_000 * sf))

    # --- dims ---
    write(
        "region",
        r_regionkey=pa.array(range(5), type=pa.int32()),
        r_name=["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    )
    write(
        "nation",
        n_nationkey=pa.array(range(25), type=pa.int32()),
        n_name=[f"NATION_{i}" for i in range(25)],
        n_regionkey=pa.array([i % 5 for i in range(25)], type=pa.int32()),
    )
    write(
        "supplier",
        s_suppkey=pa.array(range(n_supp), type=pa.int64()),
        s_name=[f"Supplier#{i:09d}" for i in range(n_supp)],
        s_nationkey=pa.array(rng.integers(0, 25, n_supp), type=pa.int32()),
        s_acctbal=np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    )
    write(
        "part",
        p_partkey=pa.array(range(n_part), type=pa.int64()),
        p_name=[
            f"{COLORS[a]} {NOUNS[b]}"
            for a, b in zip(rng.integers(0, len(COLORS), n_part), rng.integers(0, len(NOUNS), n_part))
        ],
        p_brand=[f"Brand#{i}" for i in rng.integers(0, 25, n_part)],
        p_type=[PTYPES[i] for i in rng.integers(0, len(PTYPES), n_part)],
        p_size=pa.array(rng.integers(1, 51, n_part), type=pa.int32()),
        p_retailprice=np.round(rng.uniform(100, 2000, n_part), 2),
    )
    write(
        "customer",
        c_custkey=pa.array(range(n_cust), type=pa.int64()),
        c_name=[f"Customer#{i:09d}" for i in range(n_cust)],
        c_nationkey=pa.array(rng.integers(0, 25, n_cust), type=pa.int32()),
        c_acctbal=np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        c_mktsegment=[SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
    )

    # --- orders / lineitem (1995-2001 like the driver data) ---
    odays = rng.uniform(0, 6.5 * 365, n_ord)
    write(
        "orders",
        o_orderkey=pa.array(range(n_ord), type=pa.int64()),
        o_custkey=pa.array(rng.integers(0, n_cust, n_ord), type=pa.int64()),
        o_orderstatus=[STATUS[i] for i in rng.integers(0, 3, n_ord)],
        o_totalprice=np.round(rng.uniform(1000, 400_000, n_ord), 2),
        o_orderdate=_ts_us(np.floor(odays), "1995-01-01"),
        o_orderpriority=[PRIORITIES[i] for i in rng.integers(0, 5, n_ord)],
    )
    li_ord = np.sort(rng.integers(0, n_ord, n_li))
    # linenumber = running index within each order
    linenum = np.arange(n_li) - np.searchsorted(li_ord, li_ord, side="left") + 1
    write(
        "lineitem",
        l_orderkey=pa.array(li_ord, type=pa.int64()),
        l_partkey=pa.array(rng.integers(0, n_part, n_li), type=pa.int64()),
        l_suppkey=pa.array(rng.integers(0, n_supp, n_li), type=pa.int64()),
        l_linenumber=pa.array(linenum, type=pa.int32()),
        l_quantity=np.floor(rng.uniform(1, 51, n_li)),
        l_extendedprice=np.round(rng.uniform(900, 105_000, n_li), 2),
        l_discount=np.round(rng.uniform(0, 0.10, n_li), 2),
        l_tax=np.round(rng.uniform(0, 0.08, n_li), 2),
        l_returnflag=[RFLAG[i] for i in rng.integers(0, 3, n_li)],
        l_linestatus=[STATUS[i] for i in rng.integers(0, 2, n_li)],
        l_shipdate=_ts_us(np.floor(odays[li_ord]) + rng.integers(1, 95, n_li), "1995-01-01"),
    )

    # --- events (30 days of Jan 2024, like the driver data) ---
    write(
        "events",
        event_id=pa.array(range(n_ev), type=pa.int64()),
        ts=_ts_us(np.sort(rng.uniform(0, 30, n_ev)), "2024-01-01"),
        user_id=pa.array(rng.integers(0, n_users, n_ev), type=pa.int64()),
        event_type=[ETYPES[i] for i in rng.integers(0, 5, n_ev)],
        value=np.round(rng.uniform(0.01, 500, n_ev), 2),
        props=[f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    )

    # --- documents: word salad + ~8% token-mutated near-dup copies ---
    # The driver corpus draws every token from one 31-word vocab, which
    # gives a QUADRATIC random-pair background above the MinHash band
    # (~0.25% of all pairs — fine at 500 docs, 3.6M pairs at 50k). A
    # real corpus has near-linear true-pair volume, so ~35% of tokens
    # here are doc-specific (drawn from a per-doc 7-word private vocab):
    # random pairs drop far below the est-Jaccard band while mutated
    # copies — which inherit the private tokens — stay inside it.
    lengths = rng.integers(10, 111, n_doc)
    toks: list = []
    for d in range(n_doc):
        t = rng.integers(0, len(VOCAB), int(lengths[d])).astype(object)
        priv = rng.random(len(t)) < 0.35
        t[priv] = [-(1 + 7 * d + int(j % 7)) for j in np.flatnonzero(priv)]
        toks.append(t)
    n_mut = int(0.08 * n_doc)
    dup_src = rng.integers(0, n_doc - n_mut, n_mut)  # copy an earlier doc
    for j, src in enumerate(dup_src):
        tgt = n_doc - n_mut + j
        t = toks[src].copy()
        # per-copy mutation intensity spans near-verbatim (1% flips —
        # winnow/simhash territory) to heavily edited (25% — only the
        # Jaccard/MinHash band sees it), so every dedup tier gets
        # detectable planted structure
        flip = rng.random(len(t)) < rng.uniform(0.01, 0.25)
        t[flip] = rng.integers(0, len(VOCAB), int(flip.sum()))
        toks[tgt] = t
    # negative codes are the per-doc private tokens: "w<code>" words
    texts = [" ".join(VOCAB[i] if i >= 0 else f"w{-i}" for i in t) for t in toks]
    write(
        "documents",
        doc_id=pa.array(range(n_doc), type=pa.int64()),
        text=texts,
        lang=[LANGS[i] for i in rng.integers(0, len(LANGS), n_doc)],
        source=[f"src{i}" for i in rng.integers(0, 20, n_doc)],
        n_chars=pa.array([len(s) for s in texts], type=pa.int64()),
    )

    # --- embeddings: unit vectors + ~5% planted correlated pairs ---
    dim = 64
    x = rng.standard_normal((n_vec, dim))
    n_pair = int(0.05 * n_vec) // 2
    src = rng.integers(0, n_vec - n_pair, n_pair)
    for j, s in enumerate(src):
        tgt = n_vec - n_pair + j
        alpha = rng.uniform(0.45, 0.80)  # cosine lands ~ alpha
        noise = rng.standard_normal(dim)
        x[tgt] = alpha * x[s] / np.linalg.norm(x[s]) + np.sqrt(1 - alpha**2) * noise / np.linalg.norm(noise)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    write(
        "embeddings",
        vec_id=pa.array(range(n_vec), type=pa.int64()),
        embedding=pa.array([row for row in x.astype("float32")], type=pa.list_(pa.float32())),
        label=pa.array(rng.integers(0, 10, n_vec), type=pa.int32()),
    )


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    dst = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/.scale/native_sf{sf:g}"
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    make(sf, dst, seed)


if __name__ == "__main__":
    main()
