#!/usr/bin/env python
"""Cross-round bench regression report.

Compares two BENCH_r{N}.json artifacts (the driver's per-round records)
query by query and flags regressions beyond a noise ratio. Box noise
between rounds is real — r03 measured identical r02 code 25-60% slower
— so the default threshold is deliberately loose (1.8x) and the report
separates "regressed", "improved", "new", and "gone" rather than
failing on any drift.

Usage:
    python tools/bench_compare.py BENCH_r04.json BENCH_r05.json [--threshold 1.8]

Exit code 0 always (a report, not a gate); pipe into the round notes.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        text = f.read()
    try:
        raw = json.loads(text)
    except json.JSONDecodeError:
        # bench.py emits detail + total as TWO json lines; the detail
        # line carries the per-query map
        raw = json.loads(text.splitlines()[0])
    # driver artifacts wrap the bench line differently per round; accept
    # either the flat bench JSON or the driver's {parsed: {...}} / tail form
    for candidate in (raw, raw.get("parsed") or {}):
        if isinstance(candidate, dict) and isinstance(candidate.get("queries"), dict):
            return {k: float(v) for k, v in candidate["queries"].items()}
    # last resort: driver tail capture {"tail": "...json line..."} — the
    # tail may be truncated at the FRONT, so extract the queries object
    # by brace matching rather than parsing the whole line
    tail = raw.get("tail", "")
    idx = tail.rfind('"queries":')
    if idx >= 0:
        start = tail.index("{", idx)
        depth = 0
        for i in range(start, len(tail)):
            depth += {"{": 1, "}": -1}.get(tail[i], 0)
            if depth == 0:
                d = json.loads(tail[start : i + 1])
                return {k: float(v) for k, v in d.items()}
    raise SystemExit(f"{path}: no queries dict found")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("before")
    ap.add_argument("after")
    ap.add_argument("--threshold", type=float, default=1.8)
    args = ap.parse_args()

    a, b = _load_queries(args.before), _load_queries(args.after)
    regressed, improved = [], []
    for name in sorted(set(a) & set(b)):
        if a[name] <= 0:
            continue
        ratio = b[name] / a[name]
        if ratio >= args.threshold:
            regressed.append((name, a[name], b[name], ratio))
        elif ratio <= 1 / args.threshold:
            improved.append((name, a[name], b[name], ratio))

    print(f"# bench compare: {args.before} -> {args.after} (threshold {args.threshold}x)")
    print(f"shared {len(set(a) & set(b))}  new {len(set(b) - set(a))}  gone {len(set(a) - set(b))}")
    ta = sum(a[n] for n in set(a) & set(b))
    tb = sum(b[n] for n in set(a) & set(b))
    print(f"shared-query total: {ta:.1f}s -> {tb:.1f}s ({tb / ta:.2f}x)")
    for title, rows in (("REGRESSED", regressed), ("improved", improved)):
        for name, x, y, r in rows:
            print(f"{title}: {name}: {x:.2f}s -> {y:.2f}s ({r:.2f}x)")
    if set(b) - set(a):
        print("new:", ", ".join(sorted(set(b) - set(a))))
    if set(a) - set(b):
        print("gone:", ", ".join(sorted(set(a) - set(b))))


if __name__ == "__main__":
    main()
