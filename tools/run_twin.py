#!/usr/bin/env python
"""10x twin runner: time registry queries at sf0.1 and at the native
sf1 dataset in ONE warm session (the PERFORMANCE.md twin protocol —
sf0.1 first, carrying the session constants), printing a compact
table. Generates nothing; point it at data made by
tools/make_native_data.py.

Usage: PYTHONPATH=. python tools/run_twin.py <native_dir> <query> [...]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    native_dir = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark_big_data_spark.queries import REGISTRY
    from pyspark_big_data_spark.session import get_spark

    spark = get_spark("twin")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for qname in names:
        out = {}
        for label, d in (("sf0.1", sf_dir), ("native", native_dir)):
            spark.catalog.clearCache()
            t0 = time.time()
            rows = REGISTRY[qname](spark, d).collect()
            out[label] = time.time() - t0
            gates = {
                k: v for r in rows for k, v in r.asDict().items() if k.endswith("_gate")
            }
            print(
                f"twin: {qname} @ {label}: {out[label]:.2f}s "
                f"({len(rows)} rows, gates {gates})"
            )
        print(
            f"TWIN {qname}: sf0.1 {out['sf0.1']:.2f}s | native {out['native']:.2f}s "
            f"| ratio {out['native'] / out['sf0.1']:.2f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
