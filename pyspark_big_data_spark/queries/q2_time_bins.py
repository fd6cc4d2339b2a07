"""Q2 shape: filtered event counts binned by time-of-day.

Reference semantics: ``src/query2.py:96-132`` — equality filter
(``Premis Desc == "STREET"``), zero-pad HHMM to 4 chars with lpad,
4-way CASE binning by **lexicographic** string comparison
("0500" <= t <= "1159" etc., ``src/query2.py:112-125``), group-count,
order by count desc. The lexicographic-compare-on-padded-strings
semantics is preserved exactly (it is correct because lpad fixes the
width — a documented parity trap, SURVEY.md §7).

Testdata realization (FIXTURES.md): events filtered to one event_type,
ts hour:minute binned into 4 day parts.

Scale notes: single shuffle (the 4-row group count); filter and the
narrow (ts, event_type) projection push into the parquet scan. The CASE
chain is whole-stage-codegen'd — no Python involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_BINS = [
    ("0500", "1159", "morning"),
    ("1200", "1659", "afternoon"),
    ("1700", "2059", "evening"),
]
_OTHER = "night"
_EVENT_TYPE = "click"

_ORACLE = f"""
WITH binned AS (
    SELECT CASE
             WHEN hhmm >= '0500' AND hhmm <= '1159' THEN 'morning'
             WHEN hhmm >= '1200' AND hhmm <= '1659' THEN 'afternoon'
             WHEN hhmm >= '1700' AND hhmm <= '2059' THEN 'evening'
             ELSE 'night'
           END AS day_part
    FROM (
        SELECT lpad(CAST(hour(ts) * 100 + minute(ts) AS STRING), 4, '0') AS hhmm
        FROM events
        WHERE event_type = '{_EVENT_TYPE}'
    )
)
SELECT day_part, COUNT(*) AS cnt
FROM binned
GROUP BY day_part
ORDER BY cnt DESC, day_part ASC
"""


def _day_part(hhmm):
    expr = None
    for lo, hi, name in _BINS:
        cond = (hhmm >= lo) & (hhmm <= hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(_OTHER)


@register("q2_event_time_bins", oracle=_ORACLE)
def q2_event_time_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    hhmm = F.lpad((F.hour("ts") * 100 + F.minute("ts")).cast("string"), 4, "0")
    return (
        events.filter(F.col("event_type") == _EVENT_TYPE)
        .select(_day_part(hhmm).alias("day_part"))
        .groupBy("day_part")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("day_part").asc())
    )


@register("q2_event_time_bins_sql", oracle=_ORACLE, driver=False)
def q2_event_time_bins_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query as one Spark SQL string (== ``src/query2.py:61-93``)."""
    read_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(_ORACLE.replace("FROM events", "FROM events_v"))
