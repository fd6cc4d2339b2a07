"""The reference's four crime-domain queries, reimplemented exactly —
same semantics, same quirks, Spark-idiomatic plans.

A user of marvlach/pyspark-big-data runs these on the real LA tables;
here they run on any DataFrames with the T1–T5 schemas (FIXTURES.md).
Parity points honored, with reference citations:

- string-sliced year/month from ``DATE OCC`` (``src/query1.py:134``);
- lpad + lexicographic time-of-day binning (``src/query2.py:109-125``);
- trailing-space ``AREA `` join key (``src/query4.py:43``);
- sentinel "-" / NULL descent filtering (``src/query3.py:45``);
- ZIP-4 truncation toggle that changes results (``src/query3.py:83-88``);
- inner joins double as null filters (``src/query3.py:116,122``);
- two-phase top/bottom-3 with driver head(3) + isin (``src/query3.py:131-146``)
  — plus the engine's cache fix so the join pipeline runs once (§3.3);
- firearm range predicate and (0,0)-coordinate exclusion
  (``src/query4.py:37-42``).

Distance: the engine's semantics-bearing implementation is the pure
column haversine (geodesic differs by ~0.3%; the geopy UDF tier exists
in functions/distance.py for parity benchmarking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.functions.distance import haversine_km

AREA = "AREA "  # the trailing space is part of the reference schema


def crime_q1_top_months(crimes: DataFrame) -> DataFrame:
    """Top-3 crime months per year (== src/query1.py:121-146)."""
    counts = (
        crimes.select(
            crimes["DATE OCC"][7:4].cast("int").alias("year"),  # slice sugar, 1-based
            F.expr("substring(`DATE OCC`, 0, 2)").cast("int").alias("month"),
        )
        .groupBy("year", "month")
        .agg(F.count(F.lit(1)).alias("crime_total"))
    )
    w = Window.partitionBy("year").orderBy(F.col("crime_total").desc(), F.col("month").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") < 4)
        .orderBy(F.col("year").asc(), F.col("rank").asc())
    )


def crime_q2_street_time_bins(crimes: DataFrame) -> DataFrame:
    """STREET crimes per time-of-day bin, desc (== src/query2.py:96-132)."""
    hhmm = F.lpad(F.col("TIME OCC").cast("string"), 4, "0")
    day_part = (
        F.when((hhmm >= "0500") & (hhmm <= "1159"), "morning")
        .when((hhmm >= "1200") & (hhmm <= "1659"), "afternoon")
        .when((hhmm >= "1700") & (hhmm <= "2059"), "evening")
        .otherwise("night")
    )
    return (
        crimes.filter(F.col("Premis Desc") == "STREET")
        .select(day_part.alias("day_part"))
        .groupBy("day_part")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("day_part").asc())
    )


def crime_q3_descent_profile(
    crimes: DataFrame,
    revgeo: DataFrame,
    income: DataFrame,
    descent_dim: DataFrame,
    top: bool = True,
    hint_revgeo: str | None = None,
    hint_income: str | None = None,
    truncate_zip4: bool = False,
) -> DataFrame:
    """Victim-descent profile of the top/bottom-3 income ZIPs for 2015
    (== src/query3.py). Two-phase head(3)+isin preserved; the joined
    frame is cached so the pipeline executes once (SURVEY.md §3.3 fix).

    ``truncate_zip4`` defaults to False to match the reference's SHIPPED
    behavior: its ZIP-4 truncation is commented out
    (src/query3.py:95-96, "this affects query result"), so default-arg
    callers here get the same digits a reference user gets. Pass True
    for the cleaned-ZIP variant the reference docstring describes."""
    c = crimes.filter(
        (F.col("Vict Descent") != "-") & F.col("Vict Descent").isNotNull()
    ).filter(crimes["DATE OCC"][7:4] == "2015").select("DR_NO", "Vict Descent", "LAT", "LON")

    r = revgeo.filter(F.col("ZIPcode").isNotNull())
    if truncate_zip4:  # BEWARE: affects results (src/query3.py:84-88)
        r = r.withColumn("ZIPcode", F.regexp_replace("ZIPcode", "-.*$", ""))
    r = r.select("LAT", "LON", "ZIPcode")

    inc = income.select(
        F.col("Zip Code").cast("string").alias("ZIPcode"),
        F.regexp_replace("Estimated Median Income", "[$,]", "").cast("float").alias("income"),
    )

    if hint_revgeo:
        r = r.hint(hint_revgeo)
    if hint_income:
        inc = inc.hint(hint_income)
    hinted = bool(hint_revgeo or hint_income)
    if hinted:
        # cache-buster + no caching: CacheManager matches plans ignoring
        # hints, so a cached unhinted run would silently serve (and
        # erase) the hinted join (see queries/q3_segment_profile.py)
        c = c.where(F.lit(True))

    joined = (
        c.join(r, ["LAT", "LON"], "inner")  # composite key, inner == null filter
        .join(inc, "ZIPcode", "inner")
        .select("ZIPcode", "income", "Vict Descent")
    )
    if not hinted:
        joined = joined.cache()

    zip_income = joined.select("ZIPcode", "income").distinct()
    order = F.col("income").desc() if top else F.col("income").asc()
    where_zips = [
        row["ZIPcode"] for row in zip_income.sort(order, F.col("ZIPcode")).head(3)
    ]

    return (
        joined.filter(F.col("ZIPcode").isin(where_zips))
        .join(F.broadcast(descent_dim), "Vict Descent", "inner")
        .groupBy("Victim Descent")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("Victim Descent").asc())
    )


def crime_q4_firearm_distance(crimes: DataFrame, police: DataFrame) -> DataFrame:
    """Average distance (km) from firearm crimes to their division's
    station + count per division, desc (== src/query4.py:33-70)."""
    c = crimes.filter(
        F.col("Weapon Used Cd").isNotNull()
        & (F.col("Weapon Used Cd") >= 100)
        & (F.col("Weapon Used Cd") < 200)
        & ((F.col("LAT") != 0) | (F.col("LON") != 0))
    )
    p = police.select(
        F.col("PREC"),
        F.col("DIVISION"),
        F.col("x").alias("POLICE LON"),  # x/y are swapped on purpose (README.md:110)
        F.col("y").alias("POLICE LAT"),
    )
    joined = c.join(F.broadcast(p), c[AREA] == p["PREC"], "inner")
    dist = haversine_km(
        F.col("LAT"), F.col("LON"), F.col("POLICE LAT"), F.col("POLICE LON")
    )
    return (
        joined.withColumn("distance", dist)
        .groupBy("DIVISION")
        .agg(
            F.round(F.avg("distance"), 6).alias("average_distance"),
            F.count(F.lit(1)).alias("incidents_total"),
        )
        .orderBy(F.col("incidents_total").desc(), F.col("DIVISION").asc())
    )


def crime_q1_sql(spark: SparkSession, crimes: DataFrame) -> DataFrame:
    """SQL-text variant of q1 (== src/query1.py:81-118)."""
    crimes.createOrReplaceTempView("crime_data")
    return spark.sql(
        """
        SELECT year, month, crime_total, rank FROM (
            SELECT year, month, crime_total,
                   ROW_NUMBER() OVER (
                       PARTITION BY year ORDER BY crime_total DESC, month ASC
                   ) AS rank
            FROM (
                SELECT CAST(substring(`DATE OCC`, 7, 4) AS INT) AS year,
                       CAST(substring(`DATE OCC`, 0, 2) AS INT) AS month,
                       COUNT(*) AS crime_total
                FROM crime_data
                GROUP BY year, month
            )
        )
        WHERE rank < 4
        ORDER BY year ASC, rank ASC
        """
    )
