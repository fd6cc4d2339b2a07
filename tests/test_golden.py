"""Golden-file e2e tests (the reference's methodology, SURVEY.md §5:
checked-in expected outputs per query). Queries are fully ordered with
explicit tie-breaks, so comparison is positional and exact (floats kept
as strings — the engine rounds them deterministically upstream)."""

from __future__ import annotations

import json
import pathlib

import pytest

from pyspark_big_data_spark.queries import REGISTRY

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
GOLDEN = sorted(p.stem for p in GOLDEN_DIR.glob("*.json"))


@pytest.mark.parametrize("name", GOLDEN)
def test_matches_golden(spark, sf_dir, name):
    with open(GOLDEN_DIR / f"{name}.json") as f:
        want = json.load(f)
    df = REGISTRY[name](spark, sf_dir)
    assert df.columns == want["columns"]
    got = [[str(v) for v in row] for row in df.collect()]
    want_rows = [[str(v) for v in row] for row in want["rows"]]
    assert got == want_rows, f"{name}: first diff at row " + str(
        next((i for i, (a, b) in enumerate(zip(got, want_rows)) if a != b), "len")
    )
