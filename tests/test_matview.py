"""Materialized-view rewrite semantics (operators/matview.py)."""

from __future__ import annotations

import os

from pyspark_big_data_spark.operators.matview import (
    answer_aggregate,
    create_matview,
    rewrite_aggregate,
)


def _base(spark):
    return spark.createDataFrame(
        [
            ("a", "x", 1, 10.0),
            ("a", "x", 2, None),  # null measure: count(v) != count(*)
            ("a", "y", 1, 30.0),
            ("b", "x", 1, 5.0),
            ("b", "y", 2, 7.0),
        ],
        "g1 string, g2 string, g3 int, v double",
    )


def _mv(spark, tmp_path):
    mv_dir = str(tmp_path / "mv")
    create_matview(
        _base(spark),
        mv_dir,
        group_cols=["g1", "g2", "g3"],
        measures=[("sum", "v"), ("count", None), ("count", "v"), ("min", "v"), ("max", "v")],
    )
    return mv_dir


AGGS = {
    "n": ("count", None),
    "n_v": ("count", "v"),
    "sum_v": ("sum", "v"),
    "avg_v": ("avg", "v"),
    "min_v": ("min", "v"),
    "max_v": ("max", "v"),
}


def test_mv_and_base_arms_agree_exactly(spark, tmp_path):
    mv_dir = _mv(spark, tmp_path)
    served_df, served = answer_aggregate(
        spark, mv_dir, ["g1"], AGGS, base_loader=lambda: _base(spark)
    )
    assert served
    import pyspark.sql.functions as F
    base_rows = {
        r["g1"]: r
        for r in _base(spark)
        .groupBy("g1")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("v").alias("n_v"),
            F.sum(F.col("v").cast("decimal(30,8)")).cast("double").alias("sum_v"),
            (F.sum(F.col("v").cast("decimal(30,8)")).cast("double") / F.count("v")).alias("avg_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }
    mv_rows = {r["g1"]: r for r in served_df.collect()}
    assert set(mv_rows) == set(base_rows)
    for k in base_rows:
        for c in AGGS:
            assert mv_rows[k][c] == base_rows[k][c], (k, c)
    # null-measure semantics preserved through the rollup
    assert mv_rows["a"]["n"] == 3 and mv_rows["a"]["n_v"] == 2


def test_rewritten_plan_reads_only_mv_files(spark, tmp_path):
    mv_dir = _mv(spark, tmp_path)
    df = rewrite_aggregate(spark, mv_dir, ["g1", "g2"], {"sum_v": ("sum", "v")})
    files = df.inputFiles()
    assert files and all(os.path.join(mv_dir, "data") in f for f in files)


def test_refusals(spark, tmp_path):
    mv_dir = _mv(spark, tmp_path)
    # group col not in the MV grain
    assert rewrite_aggregate(spark, mv_dir, ["v"], {"n": ("count", None)}) is None
    # measure never stored
    assert rewrite_aggregate(spark, mv_dir, ["g1"], {"s": ("sum", "g3")}) is None
    # non-reaggregable aggregate
    assert (
        rewrite_aggregate(spark, mv_dir, ["g1"], {"d": ("count_distinct", "v")}) is None
    )
    # fallback arm actually computes from base and flags served=False
    df, served = answer_aggregate(
        spark, mv_dir, ["g1"], {"s": ("sum", "g3")},
        base_loader=lambda: _base(spark),
    )
    assert not served
    rows = {r["g1"]: r["s"] for r in df.collect()}
    assert rows == {"a": 4.0, "b": 3.0}


def test_incremental_refresh_matches_rebuild(spark, tmp_path):
    from pyspark_big_data_spark.operators.matview import refresh_incremental

    old = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", None), ("c", 5.0)], "g string, v double"
    )
    delta = spark.createDataFrame(
        [("a", 0.5), ("b", None), ("d", 9.0)], "g string, v double"  # d: new group
    )
    measures = [("sum", "v"), ("count", None), ("count", "v"), ("min", "v"), ("max", "v")]

    inc_dir = str(tmp_path / "inc")
    create_matview(old, inc_dir, ["g"], measures)
    desc = refresh_incremental(spark, inc_dir, delta)
    assert desc["data_dir"] == "data_v1"  # epoch repointed atomically

    full_dir = str(tmp_path / "full")
    create_matview(old.unionByName(delta), full_dir, ["g"], measures)

    aggs = {
        "s": ("sum", "v"),
        "n": ("count", None),
        "nv": ("count", "v"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
    }
    inc = {r["g"]: r for r in rewrite_aggregate(spark, inc_dir, ["g"], aggs).collect()}
    full = {r["g"]: r for r in rewrite_aggregate(spark, full_dir, ["g"], aggs).collect()}
    assert set(inc) == set(full) == {"a", "b", "c", "d"}
    for g in full:
        for c in aggs:
            assert inc[g][c] == full[g][c], (g, c)
    # the all-null group stays NULL-summed, not zero
    assert inc["b"]["s"] is None and inc["b"]["n"] == 2 and inc["b"]["nv"] == 0
    # untouched group keeps its exact partials
    assert inc["c"]["s"] == 5.0 and inc["c"]["n"] == 1


def test_refresh_folds_null_group_key(spark, tmp_path):
    """groupBy treats NULL as one group; the refresh join must too.

    A plain equi-join never matches NULL = NULL, so each refresh would
    append one extra partial row for the null-keyed group instead of
    folding it (r9 advice item). With the null-safe join the MV holds
    exactly one row per group — including the NULL group — and its
    partials fold like any other group's."""
    from pyspark_big_data_spark.operators.matview import refresh_incremental

    mv_dir = str(tmp_path / "nullkey")
    base = spark.createDataFrame(
        [(None, 1.0), ("a", 2.0)], "g string, v double"
    )
    create_matview(base, mv_dir, ["g"], [("sum", "v"), ("count", None)])
    for _ in range(2):
        refresh_incremental(
            spark,
            mv_dir,
            spark.createDataFrame([(None, 1.0)], "g string, v double"),
        )
    desc_rows = spark.read.parquet(str(tmp_path / "nullkey" / "data_v2")).collect()
    assert len(desc_rows) == 2  # one partial row per group, null included
    got = {
        r["g"]: (r["s"], r["n"])
        for r in rewrite_aggregate(
            spark, mv_dir, ["g"], {"s": ("sum", "v"), "n": ("count", None)}
        ).collect()
    }
    assert got == {None: (3.0, 3), "a": (2.0, 1)}


def test_refresh_epoch_retention(spark, tmp_path):
    """Repeated refreshes keep only the live epoch + its predecessor."""
    import os

    from pyspark_big_data_spark.operators.matview import refresh_incremental

    mv_dir = str(tmp_path / "ret")
    base = spark.createDataFrame([("a", 1.0)], "g string, v double")
    create_matview(base, mv_dir, ["g"], [("sum", "v"), ("count", None)])
    for _ in range(3):
        refresh_incremental(
            spark, mv_dir, spark.createDataFrame([("a", 1.0)], "g string, v double")
        )
    epochs = sorted(d for d in os.listdir(mv_dir) if d.startswith("data_v"))
    assert epochs == ["data_v2", "data_v3"]  # predecessor kept, older reclaimed
    got = rewrite_aggregate(spark, mv_dir, ["g"], {"s": ("sum", "v")}).collect()
    assert got[0]["s"] == 4.0  # 1 base + 3 refreshes
