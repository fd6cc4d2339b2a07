"""Semi-structured and distributional queries: JSON extraction over the
events.props column, and exact percentiles.

The reference's data is flat strings/numbers only (SURVEY.md §1: "no
array/map/struct"); real event pipelines carry JSON payloads, so the
engine treats JSON extraction as first-class. Spark side uses
get_json_object (codegen'd path) — from_json with an explicit schema is
the bulk-typed alternative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from pyspark_big_data_spark.functions.aggregates import dsum, dsum_sql
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_JSON_ORACLE = f"""
SELECT event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS cnt,
       {dsum_sql("value", "sum_value")}
FROM events
WHERE json_extract(props, '$.k') IS NOT NULL
GROUP BY event_type, k_bucket
ORDER BY event_type, k_bucket
"""


@register("json_props_extract", oracle=_JSON_ORACLE)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract a JSON field from the props payload and aggregate by it."""
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.filter(k.isNotNull())
        .select("event_type", (k % 10).alias("k_bucket"), "value")
        .groupBy("event_type", "k_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value"))
        .orderBy("event_type", "k_bucket")
    )


@register("json_props_typed", driver=False)  # rows-only twin using from_json (typed bulk parse)
def json_props_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregation via from_json with a declared schema — the bulk
    path when a payload has many fields (single parse, typed struct)."""
    ev = read_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = ev.withColumn("p", F.from_json("props", schema))
    return (
        parsed.filter(F.col("p.k").isNotNull())
        .select("event_type", (F.col("p.k") % 10).alias("k_bucket"), "value")
        .groupBy("event_type", "k_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value"))
        .orderBy("event_type", "k_bucket")
    )


_PCT_ORACLE = """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       COUNT(*) AS cnt
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("price_percentiles", oracle=_PCT_ORACLE)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`). The 100 TB path is percentile_approx
    (t-digest, single pass, mergeable) — asserted close in
    tests/test_operators.py."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("o_orderpriority")
    )


@register("json_props_variant", oracle=_JSON_ORACLE, driver=False)
def json_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregation through Spark 4's VARIANT type: one
    ``try_parse_json`` into the binary variant encoding, then typed
    ``try_variant_get`` path extraction.

    Why it exists at 100 TB: VARIANT parses the JSON ONCE into a
    columnar binary form; repeated path extraction is then a binary
    probe, not a re-parse — versus get_json_object, which re-parses the
    string per call site. For payloads queried by several downstream
    fields this is the modern semi-structured plan (and it shreds into
    Parquet in newer table formats). Oracle: identical aggregate via
    DuckDB json_extract — three independent parse paths, one result
    (get_json_object / from_json / variant)."""
    ev = read_table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    k = F.try_variant_get(v, "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"), "value")
        .filter(F.col("k").isNotNull())
        .select("event_type", (F.col("k") % 10).alias("k_bucket"), "value")
        .groupBy("event_type", "k_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value"))
        .orderBy("event_type", "k_bucket")
    )
