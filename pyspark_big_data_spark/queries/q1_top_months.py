"""Q1 shape: top-3 months per year by row count (grouped ranking).

Reference semantics: ``src/query1.py:121-146`` — derive (year, month)
from a date column, group-count, rank within year by count desc with
``row_number``, keep rank<4, order by (year, rank). The reference
extracts year/month by string slicing (``src/query1.py:134``); on typed
timestamps the idiomatic form is year()/month(). A month tie-break is
added to the window ordering because ``row_number`` ties are otherwise
nondeterministic (SURVEY.md §2.5).

Testdata realization (FIXTURES.md): orders.o_orderdate.

Scale notes: two shuffles total — hash partition by (year, month) for the
partial+final count, then by (year) for the window. The first aggregate
is map-side partial (Catalyst HashAggregate pair), so the shuffle carries
only group counts, not rows. The window partitions by year: at 100 TB the
group-count input to the window is ~years x 12 rows — trivially small; no
skew concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_ORACLE = """
WITH counts AS (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(month(o_orderdate) AS BIGINT) AS o_month,
           COUNT(*) AS cnt
    FROM orders
    GROUP BY 1, 2
), ranked AS (
    SELECT o_year, o_month, cnt,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY o_year ORDER BY cnt DESC, o_month ASC
           ) AS BIGINT) AS rnk
    FROM counts
)
SELECT o_year, o_month, cnt, rnk
FROM ranked
WHERE rnk <= 3
ORDER BY o_year ASC, rnk ASC
"""


@register("q1_top_months_per_year", oracle=_ORACLE)
def q1_top_months_per_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    counts = (
        orders.select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.month("o_orderdate").cast("long").alias("o_month"),
        )
        .groupBy("o_year", "o_month")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("o_year").orderBy(F.col("cnt").desc(), F.col("o_month").asc())
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .orderBy(F.col("o_year").asc(), F.col("rnk").asc())
    )


_ORACLE_SQL_VARIANT = _ORACLE

# String-sliced variant: the reference's dates are strings shaped
# "MM/DD/YYYY hh:mm:ss AM" and year/month come from positional slicing —
# with two documented traps (SURVEY.md §7): the Column slice sugar
# ``df[c][7:4]`` means substr(pos=7, len=4) (src/query3.py:46), and SQL
# ``substring(x, 0, 2)`` behaves as (x, 1, 2) in Spark (src/query1.py:107).
# The oracle uses the portable 1-based form; the Spark side deliberately
# uses both trap spellings to pin their semantics.
_ORACLE_STRING_SLICE = """
WITH dated AS (
    SELECT strftime(o_orderdate, '%m/%d/%Y %I:%M:%S %p') AS date_occ
    FROM orders
), counts AS (
    SELECT CAST(substr(date_occ, 7, 4) AS BIGINT) AS o_year,
           CAST(substr(date_occ, 1, 2) AS BIGINT) AS o_month,
           COUNT(*) AS cnt
    FROM dated
    GROUP BY 1, 2
), ranked AS (
    SELECT o_year, o_month, cnt,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY o_year ORDER BY cnt DESC, o_month ASC
           ) AS BIGINT) AS rnk
    FROM counts
)
SELECT o_year, o_month, cnt, rnk
FROM ranked
WHERE rnk <= 3
ORDER BY o_year ASC, rnk ASC
"""


@register("q1_top_months_string_slice", oracle=_ORACLE_STRING_SLICE, driver=False)
def q1_top_months_string_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-exact string-slicing path (== ``src/query1.py:121-146``
    semantics on a formatted date string)."""
    orders = read_table(spark, sf_dir, "orders")
    dated = orders.select(
        F.date_format("o_orderdate", "MM/dd/yyyy hh:mm:ss a").alias("date_occ")
    )
    counts = (
        dated.select(
            # Column slice sugar: [7:4] == substr(pos=7, len=4) — NOT python
            dated["date_occ"][7:4].cast("long").alias("o_year"),
            # substring(x, 0, 2) behaves as (x, 1, 2) in Spark SQL
            F.expr("substring(date_occ, 0, 2)").cast("long").alias("o_month"),
        )
        .groupBy("o_year", "o_month")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("o_year").orderBy(F.col("cnt").desc(), F.col("o_month").asc())
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .orderBy(F.col("o_year").asc(), F.col("rnk").asc())
    )


@register("q1_top_months_per_year_sql", oracle=_ORACLE_SQL_VARIANT, driver=False)
def q1_top_months_per_year_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same logical query submitted as one Spark SQL string over a temp view
    (== the reference's sql variant, ``src/query1.py:81-118``; Catalyst
    produces the identical physical plan as the DataFrame form)."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        WITH counts AS (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(month(o_orderdate) AS BIGINT) AS o_month,
                   COUNT(*) AS cnt
            FROM orders_v
            GROUP BY 1, 2
        ), ranked AS (
            SELECT o_year, o_month, cnt,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY o_year ORDER BY cnt DESC, o_month ASC
                   ) AS BIGINT) AS rnk
            FROM counts
        )
        SELECT o_year, o_month, cnt, rnk
        FROM ranked
        WHERE rnk <= 3
        ORDER BY o_year ASC, rnk ASC
        """
    )
