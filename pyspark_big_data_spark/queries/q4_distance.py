"""Q4 shape: average distance from facts to their group's station.

Reference semantics: ``src/query4.py`` — filter firearm crimes (range
predicate on a code, null guards, (0,0)-coordinate exclusion), join
crimes to police stations on an expression condition across differently
named columns (``AREA `` == ``PREC``), per-row distance UDF, group by
division: avg(distance) + count, order by count desc.

Testdata realization (FIXTURES.md): no coordinates exist in the star
schema, so deterministic synthetic coordinates are derived arithmetically
from keys (reproducible in the DuckDB oracle): each customer gets a
(lat, lon) from c_custkey; each nation a "station" (lat, lon) from
n_nationkey. Filter = acctbal range + segment null guard; join =
c_nationkey == n_nationkey (expression condition, J3); metric = avg
haversine km per nation.

Three execution tiers benchmarked against each other (the engine's
answer to the reference's df/sql vs rdd comparison):
- pure-Column haversine: whole-stage codegen, no Python workers;
- pandas_udf: Arrow-batched numpy;
- row-at-a-time udf: reference-parity foil (``src/query4.py:34``), the
  known-slow path.

Float policy: trig results differ between JVM and C math libs in the
last ulp, so the averaged distance is rounded to 6 decimals on both
sides (SURVEY.md §2.9 tolerance policy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.functions.distance import (
    geodesic_km_pandas_udf,
    haversine_km,
    haversine_km_pandas_udf,
    haversine_sql,
    make_distance_udf,
)
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

# Deterministic synthetic coordinates, expressible identically in Spark
# and DuckDB SQL (integer modulo, then exact /10 - offset double math).
_CUST_LAT = "(c_custkey % 1700) / 10.0 - 85.0"
_CUST_LON = "((c_custkey * 7) % 3600) / 10.0 - 180.0"
_STAT_LAT = "((n_nationkey * 13) % 1700) / 10.0 - 85.0"
_STAT_LON = "((n_nationkey * 29) % 3600) / 10.0 - 180.0"

_ACCTBAL_LO, _ACCTBAL_HI = 0.0, 8000.0

_ORACLE = f"""
SELECT n.n_name,
       ROUND(AVG({haversine_sql(_CUST_LAT, _CUST_LON, _STAT_LAT, _STAT_LON)}), 6)
           AS avg_dist_km,
       COUNT(*) AS cnt
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal BETWEEN {_ACCTBAL_LO} AND {_ACCTBAL_HI}
  AND c.c_mktsegment IS NOT NULL
GROUP BY n.n_name
ORDER BY cnt DESC, n_name ASC
"""


def _filtered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return (
        customer.filter(
            F.col("c_acctbal").between(_ACCTBAL_LO, _ACCTBAL_HI)  # P7 range predicate
            & F.col("c_mktsegment").isNotNull()  # P6/F8 null guard
        )
        # J3: expression condition across differently named key columns,
        # dim side broadcast (25 rows) — == src/query4.py:43 semantics.
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"], "inner")
        .selectExpr(
            "n_name",
            f"{_CUST_LAT} AS lat1",
            f"{_CUST_LON} AS lon1",
            f"{_STAT_LAT} AS lat2",
            f"{_STAT_LON} AS lon2",
        )
    )


def _aggregate(df: DataFrame, dist: Column) -> DataFrame:
    return (
        df.withColumn("dist_km", dist)
        .groupBy("n_name")
        .agg(
            F.round(F.avg("dist_km"), 6).alias("avg_dist_km"),  # A2 multi-aggregate
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy(F.col("cnt").desc(), F.col("n_name").asc())
    )


@register("q4_avg_distance", oracle=_ORACLE)
def q4_avg_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale default: pure-Column haversine, zero Python workers."""
    df = _filtered_join(spark, sf_dir)
    return _aggregate(df, haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")))


@register("q4_avg_distance_pandas_udf", oracle=_ORACLE, driver=False)
def q4_avg_distance_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas_udf tier (D1 modernized)."""
    df = _filtered_join(spark, sf_dir)
    udf = haversine_km_pandas_udf()
    return _aggregate(df, udf(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")))


@register("q4_avg_distance_geodesic", driver=False)  # no SQL oracle: iterative WGS-84
def q4_avg_distance_geodesic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-exact semantics tier: WGS-84 geodesic distance
    (geopy's Karney when installed == ``src/query4.py:9-10,34``; else a
    vectorized Vincenty inverse agreeing to <1e-9 relative), Arrow-
    batched. The haversine default differs from these digits by ~0.3%
    (tested in tests/test_geodesic.py); a reference user porting q4
    verbatim should use THIS entry. Rows-only driver check — an
    iterative geodesic has no DuckDB twin."""
    df = _filtered_join(spark, sf_dir)
    udf = geodesic_km_pandas_udf()
    return _aggregate(df, udf(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")))


@register("q4_avg_distance_sql_udf", oracle=_ORACLE, driver=False)
def q4_avg_distance_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-registered row-at-a-time UDF called from SQL text
    (D2, == ``src/query4.py:76,89``). Parity foil — the slow path."""
    spark.udf.register("dist_km_udf", make_distance_udf(prefer_geodesic=False))
    _filtered_join(spark, sf_dir).createOrReplaceTempView("q4_input_v")
    return spark.sql(
        """
        SELECT n_name,
               ROUND(AVG(dist_km_udf(lat1, lon1, lat2, lon2)), 6) AS avg_dist_km,
               COUNT(*) AS cnt
        FROM q4_input_v
        GROUP BY n_name
        ORDER BY cnt DESC, n_name ASC
        """
    )
