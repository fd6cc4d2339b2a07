"""Count-min sketch properties beyond the oracle replay: the structural
guarantees (never-underestimate, grid bound, mergeability) hold for ANY
probe set, not just the top-N the oracled query emits."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.functions import text as TX
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.sketch_freq import (
    _CMS_D,
    _CMS_W,
    cms_cells,
    cms_estimate,
)


def _toks(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(F.explode(TX.tokens(F.col("text"))).alias("tok"))


def test_cms_grid_is_bounded(spark, sf_dir):
    cells = cms_cells(_toks(spark, sf_dir)).collect()
    assert len(cells) <= _CMS_D * _CMS_W
    seeds = {r["seed"] for r in cells}
    assert seeds == set(range(_CMS_D))
    assert all(0 <= r["bucket"] < _CMS_W for r in cells)
    # every row of the grid sums to the full stream length
    total = _toks(spark, sf_dir).count()
    by_seed = {}
    for r in cells:
        by_seed[r["seed"]] = by_seed.get(r["seed"], 0) + r["cell"]
    assert all(v == total for v in by_seed.values()), by_seed


def test_cms_never_underestimates_any_token(spark, sf_dir):
    """est >= exact for EVERY distinct token — the deterministic CMS
    guarantee, checked exhaustively (sf0.001 vocab is small)."""
    toks = _toks(spark, sf_dir)
    exact = toks.groupBy(F.col("tok").alias("token")).agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    cells = cms_cells(toks)
    est = cms_estimate(exact.select("token"), cells)
    bad = (
        exact.join(est, "token")
        .filter(F.col("est_cnt") < F.col("exact_cnt"))
        .count()
    )
    assert bad == 0


def test_cms_cells_merge_across_shards(spark, sf_dir):
    """Sharded sketches merged by cell-wise ADD equal the single-pass
    sketch — the property that makes CMS usable across days/shards."""
    docs = read_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)

    def grid(d):
        return cms_cells(d.select(F.explode(TX.tokens(F.col("text"))).alias("tok")))

    merged = (
        grid(a)
        .unionByName(grid(b))
        .groupBy("seed", "bucket")
        .agg(F.sum("cell").alias("cell"))
    )
    whole = grid(docs)
    diff = merged.join(whole, ["seed", "bucket"], "full").filter(
        ~F.coalesce(merged["cell"], F.lit(0)).eqNullSafe(F.coalesce(whole["cell"], F.lit(0)))
    )
    assert diff.count() == 0
