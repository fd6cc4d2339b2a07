#!/usr/bin/env python
"""Derive a scale-stress dataset by replicating a driver SF N times with
consistent key offsets (VERDICT r1 #10: confirm the perf budget holds
when data outgrows cache and AQE actually coalesces).

NOT new synthetic data: every row is a key-shifted copy of driver rows,
so distributions, value domains, and join fan-outs are preserved.
Dimension tables (region/nation/supplier/part) stay fixed — only facts
replicate, exactly how a larger TPC-H SF behaves. Cross-table key
consistency: o_custkey/c_custkey/events.user_id share one stride
(reshaping.py joins user_id = o_custkey); l_orderkey/o_orderkey share
another. Caveat (documented in PERFORMANCE.md): replicated documents/
embeddings are cross-copy near-duplicates, so dedup workloads see ~N x
cluster sizes — an upper-bound stress for the candidate-join stages,
harder than a real larger corpus.

    python tools/make_scale_data.py [N] [src_sf_dir] [dst_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 10_000_000  # > any base key; divisible by the % 50 probe mod

DIMS = ("region", "nation", "supplier", "part")
# fact table -> columns that get +copy*STRIDE
FACT_OFFSETS: dict[str, tuple[str, ...]] = {
    "customer": ("c_custkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def _salt_texts(texts: list[str], copy: int) -> list[str]:
    """Rewrite every token through a per-copy vocabulary bijection
    (same-length md5-derived a-z rename, cached per distinct token).

    Within a copy, identical tokens stay identical and token lengths
    are preserved, so intra-copy document similarity — exact-dup,
    shingle Jaccard, MinHash estimates, winnow fingerprints — carries
    over from the source corpus. Across copies the same token maps to
    unrelated strings, so cross-copy replicas share ~no shingles. True
    near-dup pair volume then grows ~linearly with N — the shape of a
    real larger corpus — instead of quadratically as with verbatim
    replicas. (A position-keyed constant-salt scheme was tried first
    and rejected: constant salts shared across documents inflated
    cross-document similarity ~24x.)
    """
    import hashlib

    cache: dict[str, str] = {}
    out = []
    for text in texts:
        toks = text.split(" ")
        for k, t in enumerate(toks):
            r = cache.get(t)
            if r is None:
                # a-z alphabet (not hex): keeps char-shingle entropy close
                # to natural text so shingle-overlap stats don't collapse
                d = hashlib.md5(f"{copy}:{t}".encode()).digest()
                az = "".join(chr(97 + b % 26) for b in d)
                r = (az * (len(t) // 16 + 1))[: len(t)] if t else t
                cache[t] = r
            toks[k] = r
        out.append(" ".join(toks))
    return out


def scale_table(src: str, dst: str, name: str, n_copies: int, salt_docs: bool = False) -> int:
    t = pq.read_table(f"{src}/{name}.parquet")
    if name in DIMS:
        pq.write_table(t, f"{dst}/{name}.parquet")
        return t.num_rows
    copies = []
    for i in range(n_copies):
        c = t
        for col in FACT_OFFSETS[name]:
            idx = c.schema.get_field_index(col)
            shifted = pc.add(c.column(col), pa.scalar(i * STRIDE, type=c.schema.field(col).type))
            c = c.set_column(idx, c.schema.field(col), shifted)
        if salt_docs and name == "documents" and i > 0:
            idx = c.schema.get_field_index("text")
            salted = pa.array(_salt_texts(c.column("text").to_pylist(), i), type=pa.string())
            c = c.set_column(idx, c.schema.field("text"), salted)
            if "n_chars" in c.schema.names:
                nidx = c.schema.get_field_index("n_chars")
                nchars = pc.utf8_length(c.column("text")).cast(c.schema.field("n_chars").type)
                c = c.set_column(nidx, c.schema.field("n_chars"), nchars)
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{dst}/{name}.parquet")
    return out.num_rows


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--salt-docs"]
    salt_docs = "--salt-docs" in sys.argv[1:]
    n_copies = int(args[0]) if len(args) > 0 else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    dst = (
        args[2]
        if len(args) > 2
        else f"/root/repo/.scale/sf{n_copies}x{'_salted' if salt_docs else ''}"
    )
    os.makedirs(dst, exist_ok=True)
    for name in list(DIMS) + list(FACT_OFFSETS):
        rows = scale_table(src, dst, name, n_copies, salt_docs=salt_docs)
        print(f"{name}: {rows} rows -> {dst}/{name}.parquet")


if __name__ == "__main__":
    main()
