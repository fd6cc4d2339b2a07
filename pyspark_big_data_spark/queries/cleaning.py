"""Data-cleaning query shapes from the reference that the star schema
doesn't exercise on its own: formatted-numeric parsing (the
"$87,007"-income trap, F6/F5) and composite-key joins with USING-style
key dedup (J1), plus distinct-count aggregates (exact + approximate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

# Format o_totalprice as a currency string, then parse it back the way
# the reference cleans income (src/query3.py:68-71): regexp_replace
# [$,] -> cast. printf/format_string is identical in both engines.
_CLEAN_ORACLE = """
WITH formatted AS (
    SELECT o_orderkey,
           '$' || printf('%.2f', o_totalprice) AS price_str
    FROM orders
), parsed AS (
    SELECT o_orderkey,
           price_str,
           CAST(regexp_replace(price_str, '[$,]', '', 'g') AS DOUBLE) AS price_parsed
    FROM formatted
)
SELECT o_orderkey, price_str, price_parsed
FROM parsed
WHERE price_parsed > 250000.0
ORDER BY o_orderkey
"""


@register("clean_formatted_currency", oracle=_CLEAN_ORACLE)
def clean_formatted_currency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: format price as '$123456.79', strip [$,], cast back
    (F6 regexp_replace + F5 cast, == ``src/query3.py:68-71``)."""
    orders = read_table(spark, sf_dir, "orders")
    formatted = orders.select(
        "o_orderkey",
        F.concat(F.lit("$"), F.format_string("%.2f", F.col("o_totalprice"))).alias("price_str"),
    )
    parsed = formatted.withColumn(
        "price_parsed", F.regexp_replace(F.col("price_str"), "[$,]", "").cast("double")
    )
    return parsed.filter(F.col("price_parsed") > 250000.0).orderBy("o_orderkey")


# Composite-key join with USING-style key dedup (J1: crimes ⋈ revgeo on
# [LAT, LON], src/query3.py:117-120). Realization: per-(returnflag,
# linestatus) lineitem aggregates joined back on the composite key.
_COMPOSITE_ORACLE = """
WITH stats AS (
    SELECT l_returnflag, l_linestatus, COUNT(*) AS group_cnt
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
)
SELECT l.l_returnflag, l.l_linestatus, l.l_orderkey, l.l_linenumber, s.group_cnt
FROM lineitem l
JOIN stats s USING (l_returnflag, l_linestatus)
WHERE l.l_orderkey % 100 = 0
ORDER BY l_orderkey, l_linenumber
"""


@register("composite_key_join", oracle=_COMPOSITE_ORACLE)
def composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    stats = (
        li.groupBy("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("group_cnt"))
        # P3: rename to show withColumnRenamed, then rename back for USING
        .withColumnRenamed("group_cnt", "cnt").withColumnRenamed("cnt", "group_cnt")
    )
    # list-of-names join == SQL USING: emits the key columns once (J1)
    return (
        li.join(stats, ["l_returnflag", "l_linestatus"], "inner")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber", "group_cnt")
        .orderBy("l_orderkey", "l_linenumber")
    )


_DISTINCT_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("distinct_users_by_type", oracle=_DISTINCT_ORACLE, driver=False)
def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct (expand+two-phase under Catalyst). The scale
    path is approx_count_distinct (HLL, single pass, no expand) — see
    tests/test_operators.py::test_approx_count_distinct_close for the
    accuracy check; exact keeps the oracle."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct(F.col("user_id")).alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@register("distinct_users_hll_sketch", driver=False)
def distinct_users_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches HLL count-distinct: the mergeable-sketch scale path.

    Unlike exact count_distinct (expand + two-phase shuffle of every
    key) or approx_count_distinct (single pass but opaque), hll_sketch_agg
    produces a MERGEABLE binary sketch: partial sketches built per
    partition/day/source can be hll_union_agg'd later without touching
    raw data — the building block for incremental distinct-counting over
    a 100 TB event log. No DuckDB twin (sketch binaries are
    engine-specific); accuracy and mergeability are asserted in
    tests/test_operators.py::test_hll_sketch_accuracy_and_merge."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n_users_est"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


_OVERLAP_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap
FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
)
"""


@register("user_overlap_exact", oracle=_OVERLAP_ORACLE, driver=False)
def user_overlap_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact |users(click) ∩ users(purchase)| — the ground truth for
    the sketch tier below (and the INTERSECT set-op in aggregate
    form)."""
    ev = read_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    b = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return a.intersect(b).agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))


@register("user_overlap_sketch", driver=False)
def user_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-algebra estimate of the same overlap: HLL supports only
    UNION, so intersection comes from inclusion-exclusion —
    |A∩B| ≈ est(A) + est(B) − est(A ∪ B) — computed entirely from two
    per-segment sketches and one hll_union. This is the 100 TB recipe
    for audience-overlap questions: per-segment sketches are built once
    (mergeable, tiny) and ANY pairwise overlap is answered from the
    sketch store without re-touching the event log. Error compounds
    (three estimates), so the pytest gate allows the published-HLL
    relative-error envelope vs the exact twin."""
    ev = read_table(spark, sf_dir, "events")
    sk = ev.filter(F.col("event_type").isin("click", "purchase")).groupBy(
        "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    a = sk.filter(F.col("event_type") == "click").select(F.col("sk").alias("sk_a"))
    b = sk.filter(F.col("event_type") == "purchase").select(F.col("sk").alias("sk_b"))
    both = a.crossJoin(F.broadcast(b))  # 1 row x 1 row scalar attach
    return both.select(
        (
            F.hll_sketch_estimate("sk_a")
            + F.hll_sketch_estimate("sk_b")
            - F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
        )
        .cast("long")
        .alias("n_overlap_est")
    )
