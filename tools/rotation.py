"""Compute the r13 driver-surface rotation mechanically.

Policy (registry.py r13 POLICY comment, settled in r12): heads first —
the 4 NEW r12 registrations (multi_table_txn_witness,
keyed_branch_merge_witness, mutation_sql_parity_witness,
streaming_multitxn_replay_witness), then the 31 remaining r8-stale rows
oldest-registered-first, then r9-stale rows oldest-registered-first
until the 50-row surface is full.

Run: python tools/rotation.py   (prints ROTATE_IN / ROTATE_OUT sets)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

R13_HEADS = [
    "multi_table_txn_witness",
    "keyed_branch_merge_witness",
    "mutation_sql_parity_witness",
    "streaming_multitxn_replay_witness",
]


def last_green() -> dict[str, int]:
    """name -> last round with a fully-green CORRECTNESS row."""
    out: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(path.stem.split("_r")[1])
        rows = json.loads(path.read_text())
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)
                and not row.get("err")
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> None:
    from pyspark_big_data_spark.queries import ORACLES, REGISTRY
    from pyspark_big_data_spark.queries.registry import PERMANENT_REST

    green = last_green()
    reg_order = {n: i for i, n in enumerate(REGISTRY)}
    # only ORACLED rows cycle: rows-only agreement twins stay pytest-only
    # (they would burn a hash-verified slot on a rows-only check).
    cycling = [n for n in REGISTRY if n not in PERMANENT_REST and n in ORACLES]

    surface: list[str] = [h for h in R13_HEADS if h in REGISTRY]
    # stale tiers oldest-green-first, then oldest-registered-first
    tiers: dict[int, list[str]] = {}
    for n in cycling:
        if n in surface:
            continue
        g = green.get(n)
        if g is None:
            print(f"WARNING never-green oracled non-head row: {n}", file=sys.stderr)
            g = 0  # never-verified oracled rows outrank every stale tier
        tiers.setdefault(g, []).append(n)
    for g in sorted(tiers):
        if len(surface) >= 50:
            break
        batch = sorted(tiers[g], key=reg_order.__getitem__)
        take = batch[: 50 - len(surface)]
        surface += take
        print(
            f"tier last-green r{g}: {len(tiers[g])} candidates, took {len(take)}"
            + (f" (left: {batch[len(take):]})" if len(take) < len(batch) else ""),
            file=sys.stderr,
        )
    assert len(surface) == 50, len(surface)

    rotate_in = sorted(surface)
    rotate_out = sorted(
        n for n in cycling if n not in surface and n in green
    )  # everything green before that is off-surface rests
    print("ROTATE_IN = {")
    for n in rotate_in:
        print(f'    "{n}",')
    print("}")
    print("ROTATE_OUT = {")
    for n in rotate_out:
        print(f'    "{n}",')
    print("}")


if __name__ == "__main__":
    main()
