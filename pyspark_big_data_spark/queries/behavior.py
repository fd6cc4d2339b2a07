"""User-behavior analytics over the events table: funnel conversion,
cohort retention, event-transition matrix, and time-series gap-fill.

The reference has no event-log analytics at all (its four queries are
crime-record OLAP — SURVEY.md §2); this module adds the product-
analytics staples every event pipeline runs, each expressed as plain
DataFrame ops so Catalyst keeps the whole plan JVM-side.

Scale notes (100 TB event log):
- Every query here shuffles on ``user_id`` only — high-cardinality,
  naturally balanced; AQE handles residual stragglers. No all-pairs
  anywhere.
- The funnel is three min-aggregates chained by (user-keyed join +
  time predicate); each stage's frame is one row per surviving user,
  so the join inputs SHRINK monotonically down the funnel.
- Cohort retention emits (cohort_day x offset) cells — bounded by
  days², independent of event count.
- The transition matrix is a lag window inside each user partition
  (one shuffle), then a global count over |event_types|² cells.
- Gap-fill generates each user's hourly grid with ``F.sequence``
  (map-side explode, no join against a calendar table) and fills with
  a running ``last(ignorenulls)`` window — one shuffle, grid rows
  never leave their user partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.functions.aggregates import dsum, dsum_sql
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_FMT = "yyyy-MM-dd HH:mm:ss"
_FMT_DD = "%Y-%m-%d %H:%M:%S"

# ---------------------------------------------------------------------------
# Funnel: view -> click -> purchase, strictly ordered per user
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = [("view", 1), ("click", 2), ("purchase", 3)]

_FUNNEL_ORACLE = """
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
    WHERE e.event_type = 'click' GROUP BY e.user_id
), s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
), levels AS (
    SELECT 1 AS step_no, 'view' AS step, COUNT(*) AS users FROM s1
    UNION ALL
    SELECT 2, 'click', COUNT(*) FROM s2
    UNION ALL
    SELECT 3, 'purchase', COUNT(*) FROM s3
)
SELECT step_no, step, users,
       ROUND(users * 1.0 / MAX(users) OVER (), 6) AS pct_of_first
FROM levels
ORDER BY step_no
"""


@register("funnel_conversion", oracle=_FUNNEL_ORACLE)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel: users whose first view precedes a click
    which precedes a purchase. Step N's input is step N-1's survivors,
    so each chained (join + min-agg) stage shrinks; all three stages
    shuffle on the same user_id key, which AQE coalesces.

    ``pct_of_first`` divides two exact int64 counts in one IEEE-double
    operation — bit-identical across engines (funnel monotonicity makes
    MAX() OVER () the step-1 count)."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")

    def first_after(prev: DataFrame, step: str, prev_t: str, out_t: str) -> DataFrame:
        stage = ev.filter(F.col("event_type") == step)
        return (
            stage.join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_t))
        )

    s1 = (
        ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    s2 = first_after(s1, "click", "t1", "t2")
    s3 = first_after(s2, "purchase", "t2", "t3")

    levels = None
    for (step, step_no), frame in zip(_FUNNEL_STEPS, (s1, s2, s3)):
        row = frame.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(step_no).alias("step_no"), F.lit(step).alias("step"), "users"
        )
        levels = row if levels is None else levels.unionByName(row)
    return levels.select(
        "step_no",
        "step",
        "users",
        F.round(F.col("users") / F.max("users").over(Window.partitionBy()), 6).alias(
            "pct_of_first"
        ),
    ).orderBy("step_no")


# ---------------------------------------------------------------------------
# Cohort retention: first-seen day x day offset
# ---------------------------------------------------------------------------

_COHORT_ORACLE = """
WITH first_seen AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
)
SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
       date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS offset_days,
       COUNT(DISTINCT e.user_id) AS active_users
FROM events e JOIN first_seen f ON e.user_id = f.user_id
GROUP BY f.cohort_day, 2
ORDER BY cohort_day, offset_days
"""


@register("cohort_retention", oracle=_COHORT_ORACLE)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users grouped by first-active day,
    counted distinct on each later day offset. Output is bounded by
    days² cells regardless of event volume; the only shuffles are the
    user-keyed first-seen aggregate + join and the final cell count."""
    ev = read_table(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("d"))
    first_seen = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        ev.join(first_seen, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "cohort_day").alias("offset_days"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_day", "offset_days")
    )


# ---------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov estimate)
# ---------------------------------------------------------------------------

_TRANSITION_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
), counts AS (
    SELECT prev_type, event_type AS next_type, COUNT(*) AS cnt
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT prev_type, next_type, cnt,
       ROUND(cnt * 1.0 / SUM(cnt) OVER (PARTITION BY prev_type), 6) AS p
FROM counts
ORDER BY prev_type, next_type
"""


@register("event_transition_matrix", oracle=_TRANSITION_ORACLE)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over per-user event sequences:
    P(next | prev) estimated from adjacent pairs. One user-keyed
    shuffle for the lag window; the matrix itself is |types|² cells.
    ``p`` is one int64/int64 IEEE division, exact across engines."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.select(
        "prev_type",
        "next_type",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(Window.partitionBy("prev_type")), 6).alias("p"),
    ).orderBy("prev_type", "next_type")


# ---------------------------------------------------------------------------
# Session path analysis: ordered event-type sequences per session
# ---------------------------------------------------------------------------

_PATH_GAP_MIN = 30

_PATHS_ORACLE = f"""
WITH marked AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN ts - LAG(ts) OVER w > INTERVAL {_PATH_GAP_MIN} MINUTES
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS ns
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
    SELECT user_id, ts, event_id, event_type,
           SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM marked
), paths AS (
    SELECT user_id, sid,
           array_to_string(list(event_type ORDER BY ts, event_id), '>') AS path
    FROM numbered GROUP BY 1, 2
)
SELECT path, COUNT(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
"""


@register("session_paths", oracle=_PATHS_ORACLE)
def session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the ordered event-type sequence inside each
    {_PATH_GAP_MIN}-minute-gap session, counted across all sessions —
    the 'what do users actually do' report behind funnel design.

    The ordered array aggregate is spelled engine-portably: collect the
    (ts, event_id, type) structs, ``array_sort`` (struct comparison =
    field order, so the sort key is exactly the session's event order),
    then project the type and join with '>'. Sessionization reuses the
    lag + cumulative-sum pattern of ``session_window_agg``; everything
    shares one user-keyed shuffle, and paths are bounded by session
    length, never stream length."""
    ev = read_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.expr(f"INTERVAL {_PATH_GAP_MIN} MINUTES")
    prev_ts = F.lag("ts").over(w_order)
    new_session = (prev_ts.isNull() | (F.col("ts").cast("timestamp") - prev_ts > gap)).cast(
        "long"
    )
    paths = (
        ev.withColumn("sid", F.sum(new_session).over(w_cum))
        .groupBy("user_id", "sid")
        .agg(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))).alias(
                "seq"
            )
        )
        .select(
            F.concat_ws(">", F.transform("seq", lambda x: x["event_type"])).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
    )


# ---------------------------------------------------------------------------
# Time-series gap-fill: per-user hourly grid, LOCF-filled
# ---------------------------------------------------------------------------

_GAPFILL_ORACLE = f"""
WITH obs AS (
    SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS h, value
    FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, time_bucket(INTERVAL '1 hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
), bounds AS (
    SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM obs GROUP BY user_id
), grid AS (
    SELECT user_id, unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h
    FROM bounds
), filled AS (
    SELECT g.user_id, g.h, o.value AS obs_value,
           last_value(o.value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
    FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.h = g.h
)
SELECT user_id,
       COUNT(*) AS n_slots,
       COUNT(obs_value) AS n_observed,
       COUNT(*) - COUNT(obs_value) AS n_filled,
       {dsum_sql("fv", "checksum")}
FROM filled
GROUP BY user_id
ORDER BY user_id
"""


@register("timeseries_gapfill", oracle=_GAPFILL_ORACLE)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize each user's event series onto an hourly grid and
    forward-fill gaps (LOCF) — the resample step before any
    equal-interval model. Emits a per-user digest (slot/observed/filled
    counts + decimal-exact checksum of the FILLED series) so the
    engine-comparison stays compact while pinning every filled value.

    Per hour the kept observation is the LAST event by (ts, event_id) —
    a deterministic tie-break both engines replay. The grid comes from
    ``F.sequence`` per user (map-side explode — no calendar-table
    join), and the LOCF fill is a running ``last(ignorenulls)`` window;
    grid rows never leave their user partition, so the whole query is
    one user-keyed shuffle. The first slot of every user is observed by
    construction (the grid starts at MIN(hour)), so no row is left
    null. At 100 TB the grid size is users × span-hours — independent
    of raw event count, and usually far smaller."""
    ev = read_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", "ts")
    w_last = Window.partitionBy("user_id", "h").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    obs = (
        ev.select("user_id", hour.alias("h"), "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select("user_id", "h", "value")
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
        )
    )
    w_locf = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = grid.join(obs, ["user_id", "h"], "left").select(
        "user_id",
        F.col("value").alias("obs_value"),
        F.last("value", ignorenulls=True).over(w_locf).alias("fv"),
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_slots"),
            F.count("obs_value").alias("n_observed"),
            (F.count(F.lit(1)) - F.count("obs_value")).alias("n_filled"),
            dsum("fv", "checksum"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Trailing time-window (RANGE frame) rolling aggregate
# ---------------------------------------------------------------------------

_ROLL_WINDOW_S = 3600
_ROLL_USER_MOD = 30  # sample users to bound the per-event output

_ROLLING_ORACLE = f"""
SELECT event_id, user_id,
       COUNT(*) OVER tw AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER tw AS DOUBLE) AS sum_1h
FROM events
WHERE user_id % {_ROLL_USER_MOD} = 0
WINDOW tw AS (PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL {_ROLL_WINDOW_S} SECONDS PRECEDING
                        AND CURRENT ROW)
ORDER BY user_id, event_id
"""


@register("rolling_1h_user_value", oracle=_ROLLING_ORACLE)
def rolling_1h_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour rolling count + decimal-exact sum per event —
    the RANGE frame (time-valued bounds; peers join the frame by VALUE,
    not row position), distinct from every ROWS frame elsewhere in the
    engine. Spark's rangeBetween needs a numeric ordering column, so
    the frame orders by epoch seconds with [-{_ROLL_WINDOW_S}, 0] bounds —
    exactly DuckDB's INTERVAL RANGE frame over ts, both ends inclusive
    and tied timestamps sharing one frame. One user-keyed shuffle; the
    user sample bounds the per-event OUTPUT, not the window math."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") % _ROLL_USER_MOD == 0
    )
    tw = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000))
        .rangeBetween(-_ROLL_WINDOW_S, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(tw).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(30,8)")).over(tw).cast("double").alias("sum_1h"),
    ).orderBy("user_id", "event_id")
