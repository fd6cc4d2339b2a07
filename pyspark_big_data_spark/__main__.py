"""CLI entry point — the engine's answer to the reference's per-query
spark-submit scripts (``spark-submit src/query1.py csv rdd`` becomes
``python -m pyspark_big_data_spark run q1_top_months_per_year``).

Commands:
  list                       show registered queries (* = has oracle)
  run <query> [--sf-dir D] [--show N] [--explain]
  bench                      delegate to bench.py's main
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="pyspark_big_data_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run_p = sub.add_parser("run", help="run one query")
    run_p.add_argument("query")
    run_p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run_p.add_argument("--show", type=int, default=20)
    run_p.add_argument("--explain", action="store_true")

    sub.add_parser("bench", help="run the benchmark harness")

    args = parser.parse_args(argv)

    from pyspark_big_data_spark.queries import ORACLES, REGISTRY

    if args.cmd == "list":
        for name in sorted(REGISTRY):
            mark = "*" if name in ORACLES else " "
            print(f" {mark} {name}")
        return 0

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    if args.query not in REGISTRY:
        print(f"unknown query {args.query!r}; `list` shows options", file=sys.stderr)
        return 2

    from pyspark_big_data_spark.session import get_spark

    spark = get_spark(f"run-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    df = REGISTRY[args.query](spark, args.sf_dir)
    df.show(args.show, truncate=False)
    elapsed = time.time() - t0
    if args.explain:
        df.explain("formatted")
    print(f"[{args.query}] {elapsed:.3f}s on {args.sf_dir}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
