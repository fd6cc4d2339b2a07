#!/usr/bin/env python
"""Plan inventory: physical-plan shape summary for every registered
query — the machine-readable version of the per-query scale audit.

For each query, counts the plan nodes that matter at 100 TB:
exchanges (shuffles), broadcast vs sort-merge vs shuffled-hash joins,
nested-loop joins (all allowlisted cases are documented in
tests/test_plan_guardrails.py), windows, sorts, Python workers
(Arrow-batched vs row-at-a-time), and whole-stage-codegen presence.

Usage:
    python tools/plan_report.py [sf_dir] [--markdown PLANS.md]

Prints one JSON line per query; with --markdown also writes a sorted
table. Plans are built lazily (no query execution) except where plan
CONSTRUCTION itself runs bounded driver round-trips by design
(k-means centroid landing, two-phase head/isin) — those run at the
given SF, which is why the default is the smallest fixture.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

# runnable from any cwd: the repo root is this file's parent's parent
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_NODES = {
    "exchanges": "Exchange",
    "bhj": "BroadcastHashJoin",
    "smj": "SortMergeJoin",
    "shj": "ShuffledHashJoin",
    "bnlj": "BroadcastNestedLoopJoin",
    "cartesian": "CartesianProduct",
    "window": "Window",
    "sort": "Sort",
    "arrow_python": "ArrowEvalPython",
    "map_in_pandas": "MapInPandas",
    "flatmap_groups": "FlatMapGroupsInPandas",
    "row_python": "BatchEvalPython",
}

_TREE_ART = " :+-*"


def _depth(line: str) -> int:
    i = 0
    while i < len(line) and line[i] in _TREE_ART:
        i += 1
    return i


def collapse_cached(plan: str) -> tuple[str, int]:
    """Drop REPEATED cached subtrees from a 'simple'-mode plan string.

    A ``.cache()``'d relation referenced N times prints its child plan
    N times in explain output, which over-counts every node under it
    N-fold relative to runtime (the cache materializes once). Each
    InMemoryRelation block (the node line plus everything indented
    deeper) is kept the FIRST time its normalized text appears and
    dropped on re-occurrence. Returns (collapsed_plan,
    n_collapsed_repeats)."""
    lines = plan.splitlines()
    out: list[str] = []
    seen: set[str] = set()
    collapsed = 0
    i = 0
    while i < len(lines):
        line = lines[i]
        if "InMemoryRelation" in line:
            d = _depth(line)
            j = i + 1
            while j < len(lines) and lines[j].strip() and _depth(lines[j]) > d:
                j += 1
            # key on id-normalized text: re-references of one cached
            # relation print fresh expression ids per occurrence
            key = "\n".join(
                re.sub(r"#\d+L?", "#", ln.lstrip(_TREE_ART)) for ln in lines[i:j]
            )
            if key in seen:
                collapsed += 1
                i = j
                continue
            seen.add(key)
            out.extend(lines[i:j])
            i = j
            continue
        out.append(line)
        i += 1
    return "\n".join(out), collapsed


def summarize(plan: str) -> dict[str, int]:
    """Node counts that reflect RUNTIME work: counted on the tree-only
    ('simple') plan with repeated cached subtrees collapsed — the
    'formatted' mode double-counts every node (tree + detail section)
    and cache-reusing queries over-counted further (the round-5 PLANS.md
    caveat, now fixed structurally)."""
    deduped, collapsed = collapse_cached(plan)
    counts = {key: deduped.count(node) for key, node in _NODES.items()}
    # Simple mode renders whole-stage codegen as '*(n)' node prefixes,
    # not 'WholeStageCodegen' literals — count DISTINCT region ids so
    # the column means "codegen regions", same as formatted mode's span
    # count (the literal-substring count was always 0 here).
    counts["codegen"] = len(set(re.findall(r"\*\((\d+)\)", deduped)))
    counts["cached_reuse"] = collapsed
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("--markdown", default=None)
    args = ap.parse_args()

    from pyspark_big_data_spark.queries import REGISTRY
    from pyspark_big_data_spark.session import get_spark
    from pyspark_big_data_spark.testing import physical_plan

    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name in sorted(REGISTRY):
        try:
            plan = physical_plan(REGISTRY[name](spark, args.sf_dir), mode="simple")
            s = summarize(plan)
            s["name"] = name
            s["err"] = None
        except Exception as exc:  # noqa: BLE001 — report and continue
            s = {"name": name, "err": str(exc)[:160]}
        rows.append(s)
        print(json.dumps(s), flush=True)

    if args.markdown:
        cols = ["exchanges", "bhj", "smj", "shj", "bnlj", "window", "sort",
                "arrow_python", "row_python", "codegen", "cached_reuse"]
        with open(args.markdown, "w") as f:
            f.write("# Plan inventory (generated by tools/plan_report.py)\n\n")
            f.write(f"SF dir: `{args.sf_dir}` — counts of physical-plan nodes per registered query.\n")
            f.write("Nested-loop/cartesian allowlist rationale lives in tests/test_plan_guardrails.py.\n")
            f.write("Counts are runtime-representative: tree-only explain with repeated cached "
                    "subtrees collapsed (`cached_reuse` = how many repeats were collapsed; the "
                    "cache materializes once at runtime). They are therefore roughly half the "
                    "round-5 numbers, which counted the formatted mode's tree AND detail "
                    "sections.\n\n")
            f.write("| query | " + " | ".join(cols) + " |\n")
            f.write("|---|" + "|".join(["---"] * len(cols)) + "|\n")
            for s in rows:
                if s.get("err"):
                    f.write(f"| {s['name']} | err: {s['err'][:60]} |\n")
                    continue
                f.write(f"| {s['name']} | " + " | ".join(str(s[c]) for c in cols) + " |\n")
        print(f"wrote {args.markdown}", file=sys.stderr)


if __name__ == "__main__":
    main()
