"""Range join: match events to time intervals WITHOUT an equi key.

A naive interval-containment join (`w.start <= e.ts < w.end`) has no
equality condition, so Spark plans a nested-loop join — quadratic at
scale. The engine's range join bucketizes time: intervals explode to
the coarse buckets they overlap, events map to their bucket, the join
becomes an equi-join on the bucket, and the exact range predicate
refines the candidates. Each (event, interval) pair meets in exactly
one bucket (the event's), so no dedup is needed.

Interval source here: a deterministic subset of orders opens an
18-hour "promo window" at its order date shifted into the events' time
range; the query counts open windows per event.

Scale notes: bucket granularity trades replication (intervals appear in
ceil(span/bucket)+1 buckets) against candidate selectivity — pick it
near the median interval span. The plan is shuffle-on-bucket, never
nested-loop; the guardrail test pins that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_WINDOW_HOURS = 18
_ORDER_MOD = 150  # every 150th order opens a window

# Shift order dates (1995-2001) into the events' range (2024-01):
# window k (k = o_orderkey/_ORDER_MOD) starts at 2024-01-01 + k*83 minutes.
_DD_WINDOWS = f"""
    SELECT o_orderkey AS window_id,
           TIMESTAMP '2024-01-01 00:00:00'
               + (o_orderkey // {_ORDER_MOD}) * INTERVAL '83 minutes' AS w_start,
           TIMESTAMP '2024-01-01 00:00:00'
               + (o_orderkey // {_ORDER_MOD}) * INTERVAL '83 minutes'
               + INTERVAL '{_WINDOW_HOURS} hours' AS w_end
    FROM orders WHERE o_orderkey % {_ORDER_MOD} = 0
"""

_ORACLE = f"""
WITH w AS ({_DD_WINDOWS})
SELECT e.event_id, COUNT(*) AS n_open_windows
FROM events e JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY e.event_id
ORDER BY e.event_id
"""


def _windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % _ORDER_MOD == 0)
    base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    start = F.timestamp_micros(
        F.unix_micros(base)
        + (F.col("o_orderkey") / _ORDER_MOD).cast("long") * (83 * 60 * 1_000_000)
    )
    return orders.select(
        F.col("o_orderkey").alias("window_id"),
        start.alias("w_start"),
        F.timestamp_micros(
            F.unix_micros(start) + _WINDOW_HOURS * 3600 * 1_000_000
        ).alias("w_end"),
    )


@register("range_join_open_windows", oracle=_ORACLE)
def range_join_open_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join: day-granularity equi-join + exact refine."""
    events = read_table(spark, sf_dir, "events").select("event_id", "ts")
    windows = _windows(spark, sf_dir)

    # explode each window to the day buckets it overlaps
    w_bucketed = windows.select(
        "window_id",
        "w_start",
        "w_end",
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col("w_start")).cast("date"),
                F.date_trunc("day", F.col("w_end")).cast("date"),
            )
        ).alias("bucket"),
    )
    e_bucketed = events.withColumn("bucket", F.date_trunc("day", F.col("ts")).cast("date"))

    return (
        e_bucketed.join(w_bucketed, "bucket")  # equi-join on the bucket
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))  # refine
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_open_windows"))
        .orderBy("event_id")
    )
