"""Differential tests for the reference-domain crime queries: the Spark
implementations (pyspark_big_data_spark/reference/) vs DuckDB oracles
over the SAME fixture rows — the reference's cross-API agreement
methodology with DuckDB as the second witness."""

from __future__ import annotations

import duckdb
import pytest

from pyspark_big_data_spark.functions.distance import haversine_sql
from pyspark_big_data_spark.reference import crime_queries as Q
from pyspark_big_data_spark.reference.fixtures import build_all
from pyspark_big_data_spark.testing import compare_frames


@pytest.fixture(scope="module")
def tables(spark):
    t = build_all(spark)
    for df in t.values():
        df.cache().count()
    return t


@pytest.fixture(scope="module")
def dd(tables):
    con = duckdb.connect()
    for name, df in tables.items():
        con.register(name, df.toPandas())
    return con


def test_crime_q1(tables, dd):
    got = Q.crime_q1_top_months(tables["crimes"]).toPandas()
    want = dd.execute(
        """
        SELECT year, month, crime_total, CAST(rank AS INT) AS rank FROM (
            SELECT year, month, crime_total,
                   ROW_NUMBER() OVER (
                       PARTITION BY year ORDER BY crime_total DESC, month ASC
                   ) AS rank
            FROM (
                SELECT CAST(substr("DATE OCC", 7, 4) AS INT) AS year,
                       CAST(substr("DATE OCC", 1, 2) AS INT) AS month,
                       COUNT(*) AS crime_total
                FROM crimes GROUP BY 1, 2
            )
        ) WHERE rank < 4
        ORDER BY year, rank
        """
    ).fetchdf()
    compare_frames(got, want)


def test_crime_q1_sql_variant_agrees(spark, tables):
    df_api = Q.crime_q1_top_months(tables["crimes"]).collect()
    sql_api = Q.crime_q1_sql(spark, tables["crimes"]).collect()
    assert [tuple(r) for r in df_api] == [tuple(r) for r in sql_api]


def test_crime_q2(tables, dd):
    got = Q.crime_q2_street_time_bins(tables["crimes"]).toPandas()
    want = dd.execute(
        """
        SELECT day_part, COUNT(*) AS count FROM (
            SELECT CASE
                WHEN hhmm >= '0500' AND hhmm <= '1159' THEN 'morning'
                WHEN hhmm >= '1200' AND hhmm <= '1659' THEN 'afternoon'
                WHEN hhmm >= '1700' AND hhmm <= '2059' THEN 'evening'
                ELSE 'night' END AS day_part
            FROM (
                SELECT lpad(CAST("TIME OCC" AS STRING), 4, '0') AS hhmm
                FROM crimes WHERE "Premis Desc" = 'STREET'
            )
        ) GROUP BY day_part
        ORDER BY count DESC, day_part
        """
    ).fetchdf()
    compare_frames(got, want)


@pytest.mark.parametrize("top", [True, False])
@pytest.mark.parametrize("truncate", [True, False])
def test_crime_q3(tables, dd, top, truncate):
    got = Q.crime_q3_descent_profile(
        tables["crimes"], tables["revgeo"], tables["income"], tables["descent"],
        top=top, truncate_zip4=truncate,
    ).toPandas()
    direction = "DESC" if top else "ASC"
    zip_expr = (
        "regexp_replace(ZIPcode, '-.*$', '')" if truncate else "ZIPcode"
    )
    want = dd.execute(
        f"""
        WITH c AS (
            SELECT "DR_NO", "Vict Descent", LAT, LON FROM crimes
            WHERE "Vict Descent" IS NOT NULL AND "Vict Descent" <> '-'
              AND substr("DATE OCC", 7, 4) = '2015'
        ), r AS (
            SELECT LAT, LON, {zip_expr} AS ZIPcode FROM revgeo WHERE ZIPcode IS NOT NULL
        ), inc AS (
            SELECT CAST("Zip Code" AS STRING) AS ZIPcode,
                   CAST(regexp_replace("Estimated Median Income", '[$,]', '', 'g') AS FLOAT)
                       AS income
            FROM income
        ), joined AS (
            SELECT i.ZIPcode, i.income, c."Vict Descent"
            FROM c JOIN r USING (LAT, LON) JOIN inc i USING (ZIPcode)
        ), where_zips AS (
            SELECT ZIPcode FROM (SELECT DISTINCT ZIPcode, income FROM joined)
            ORDER BY income {direction}, ZIPcode LIMIT 3
        )
        SELECT d."Victim Descent", COUNT(*) AS count
        FROM joined j
        JOIN descent d ON d."Vict Descent" = j."Vict Descent"
        WHERE j.ZIPcode IN (SELECT ZIPcode FROM where_zips)
        GROUP BY 1
        ORDER BY count DESC, d."Victim Descent"
        """
    ).fetchdf()
    compare_frames(got, want)


def test_crime_q3_truncation_toggle_changes_results(tables):
    a = Q.crime_q3_descent_profile(
        tables["crimes"], tables["revgeo"], tables["income"], tables["descent"],
        truncate_zip4=True,
    ).collect()
    b = Q.crime_q3_descent_profile(
        tables["crimes"], tables["revgeo"], tables["income"], tables["descent"],
        truncate_zip4=False,
    ).collect()
    # the reference flags this as result-affecting (src/query3.py:84-88)
    assert [tuple(r) for r in a] != [tuple(r) for r in b]


def test_crime_q4(tables, dd):
    got = Q.crime_q4_firearm_distance(tables["crimes"], tables["police"]).toPandas()
    dist = haversine_sql("c.LAT", "c.LON", 'p."y"', 'p."x"')
    want = dd.execute(
        f"""
        SELECT p."DIVISION" AS DIVISION,
               ROUND(AVG({dist}), 6) AS average_distance,
               COUNT(*) AS incidents_total
        FROM crimes c
        JOIN police p ON c."AREA " = p."PREC"
        WHERE c."Weapon Used Cd" IS NOT NULL
          AND c."Weapon Used Cd" >= 100 AND c."Weapon Used Cd" < 200
          AND (c.LAT <> 0 OR c.LON <> 0)
        GROUP BY 1
        ORDER BY incidents_total DESC, DIVISION
        """
    ).fetchdf()
    compare_frames(got, want)


def test_crime_q3_hint_passthrough(spark, tables):
    spark.catalog.clearCache()
    df = Q.crime_q3_descent_profile(
        tables["crimes"], tables["revgeo"], tables["income"], tables["descent"],
        hint_revgeo="merge",
    )
    from pyspark_big_data_spark.testing import physical_plan

    assert "SortMergeJoin" in physical_plan(df)
