"""GROUPED_AGG pandas UDF tier (queries/statistics.py): agreement gate
against the decimal-exact oracled tier — the same policy as the BLAS
fast tiers (float64 numpy means have no bit-exact SQL twin; at 6dp
rounding they must agree exactly on this data)."""

from __future__ import annotations

from pyspark_big_data_spark.queries import REGISTRY


def test_grouped_agg_udf_matches_decimal_tier(spark, sf_dir):
    udf_tier = {
        r["o_orderpriority"]: r["log_geomean"]
        for r in REGISTRY["geomean_price_grouped_agg_udf"](spark, sf_dir).collect()
    }
    exact = {
        r["o_orderpriority"]: r["log_geomean"]
        for r in REGISTRY["geomean_price_by_priority"](spark, sf_dir).collect()
    }
    assert set(udf_tier) == set(exact)
    for k in exact:
        assert abs(udf_tier[k] - exact[k]) <= 1e-6, k


def test_grouped_agg_udf_plan_is_pandas_aggregate(spark, sf_dir):
    from pyspark_big_data_spark.testing import physical_plan

    plan = physical_plan(REGISTRY["geomean_price_grouped_agg_udf"](spark, sf_dir))
    # Spark 4 names the Arrow grouped-agg node ArrowAggregatePython
    # (older releases: AggregateInPandas) — either is the by-design path
    assert "ArrowAggregatePython" in plan or "AggregateInPandas" in plan
