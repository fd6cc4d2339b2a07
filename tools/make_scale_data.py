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


def scale_table(src: str, dst: str, name: str, n_copies: int) -> int:
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
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{dst}/{name}.parquet")
    return out.num_rows


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else f"/root/repo/.scale/sf{n_copies}x"
    os.makedirs(dst, exist_ok=True)
    for name in list(DIMS) + list(FACT_OFFSETS):
        rows = scale_table(src, dst, name, n_copies)
        print(f"{name}: {rows} rows -> {dst}/{name}.parquet")


if __name__ == "__main__":
    main()
