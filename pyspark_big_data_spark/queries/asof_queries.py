"""As-of join queries over the events stream (operators/asof.py).

Two registered twins exercise both directions and both tie modes of
the union+window as-of plan, each verified against DuckDB's NATIVE
``ASOF JOIN`` — an independent second implementation of the same
semantics, not a re-derivation:

- ``asof_last_purchase_before_click``: for every click, the user's
  most recent purchase at-or-before the click (backward, inclusive) —
  the "state at event time" join of attribution pipelines.
- ``asof_next_error_after_signup``: for every signup, the user's first
  error strictly after it (forward, strict) — the time-to-failure
  probe of reliability analytics.

Quotes are pre-aggregated to one row per (user_id, ts) (max value) so
the match is deterministic under duplicate timestamps on BOTH engines;
the carried quote timestamp is returned verbatim (microsecond-exact)
rather than a derived difference, keeping the value-hash comparison
free of truncation semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.operators.asof import asof_join
from pyspark_big_data_spark.queries.registry import register

_BACKWARD_ORACLE = """
WITH probes AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), quotes AS (
    SELECT user_id, ts, MAX(value) AS purchase_value
    FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, q.ts AS purchase_ts, q.purchase_value
FROM probes p ASOF LEFT JOIN quotes q
  ON p.user_id = q.user_id AND p.ts >= q.ts
ORDER BY p.event_id
"""

_FORWARD_ORACLE = """
WITH probes AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'
), quotes AS (
    SELECT user_id, ts, MAX(value) AS error_value
    FROM events WHERE event_type = 'error' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, q.ts AS error_ts, q.error_value
FROM probes p ASOF LEFT JOIN quotes q
  ON p.user_id = q.user_id AND p.ts < q.ts
ORDER BY p.event_id
"""


def _split(spark: SparkSession, sf_dir: str, probe_type: str, quote_type: str, value_alias: str):
    events = read_table(spark, sf_dir, "events")
    probes = events.filter(F.col("event_type") == probe_type).select("event_id", "user_id", "ts")
    quotes = (
        events.filter(F.col("event_type") == quote_type)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias(value_alias))
    )
    return probes, quotes


@register("asof_last_purchase_before_click", oracle=_BACKWARD_ORACLE, driver=False)
def asof_last_purchase_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward inclusive as-of: latest purchase at-or-before each click."""
    probes, quotes = _split(spark, sf_dir, "click", "purchase", "purchase_value")
    joined = asof_join(probes, quotes, on=["user_id"], direction="backward", strict=False)
    return joined.select(
        "event_id",
        "user_id",
        F.col("q_ts").alias("purchase_ts"),
        F.col("q_purchase_value").alias("purchase_value"),
    ).orderBy("event_id")


@register("asof_next_error_after_signup", oracle=_FORWARD_ORACLE, driver=False)
def asof_next_error_after_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward strict as-of: first error strictly after each signup."""
    probes, quotes = _split(spark, sf_dir, "signup", "error", "error_value")
    joined = asof_join(probes, quotes, on=["user_id"], direction="forward", strict=True)
    return joined.select(
        "event_id",
        "user_id",
        F.col("q_ts").alias("error_ts"),
        F.col("q_error_value").alias("error_value"),
    ).orderBy("event_id")
