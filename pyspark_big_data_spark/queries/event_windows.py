"""Event-time window aggregations over the events table.

The reference has no streaming/window surface at all (SURVEY.md §2.10);
this module adds the batch event-time surface — tumbling, sliding, and
gap-based session windows — with DuckDB oracles. The same logical
operations run incrementally in streaming/ via Structured Streaming
(readStream + watermark); batch and stream share semantics, which is
the Spark-idiomatic "one API" story.

Window starts are emitted as formatted strings so oracle comparison is
timezone-representation-proof.

Scale notes: tumbling/sliding aggs are single-shuffle partial+final
HashAggregates on (window, key) — Spark's F.window derives the bucket
arithmetically, no explode for tumbling; sliding produces
window/slide copies per row (here 2x). Sessionization uses a window
function over (user) ordered by ts: one shuffle on user_id; at 100 TB
user_id is high-cardinality so partitions stay balanced (AQE handles
stragglers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.functions.aggregates import dsum, dsum_sql
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_FMT = "yyyy-MM-dd HH:mm:ss"
_FMT_DD = "%Y-%m-%d %H:%M:%S"

_TUMBLING_ORACLE = f"""
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_FMT_DD}') AS window_start,
       event_type,
       COUNT(*) AS cnt,
       {dsum_sql("value", "sum_value")}
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


@register("tumbling_window_agg", oracle=_TUMBLING_ORACLE)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value"))
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


# sliding: 1h windows every 30min — each event belongs to exactly 2 windows
_SLIDING_ORACLE = f"""
WITH assigned AS (
    SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                   time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
               AS window_start,
           value
    FROM events
)
SELECT strftime(window_start, '{_FMT_DD}') AS window_start,
       COUNT(*) AS cnt,
       {dsum_sql("value", "sum_value")}
FROM assigned
GROUP BY 1
ORDER BY 1
"""


@register("sliding_window_agg", oracle=_SLIDING_ORACLE, driver=False)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value"))
        .select(F.date_format("w.start", _FMT).alias("window_start"), "cnt", "sum_value")
        .orderBy("window_start")
    )


# session windows: per-user, 30-minute inactivity gap. Batch formulation =
# lag + cumulative session counter (identical SQL-window semantics in both
# engines); the streaming twin uses F.session_window (streaming/streams.py).
_SESSION_GAP_MIN = 30

_SESSION_ORACLE = f"""
WITH marked AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL '{_SESSION_GAP_MIN} minutes'
                OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
), numbered AS (
    SELECT user_id, ts, value,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_id
    FROM marked
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       strftime(MIN(ts), '{_FMT_DD}') AS session_start,
       strftime(MAX(ts), '{_FMT_DD}') AS session_end,
       COUNT(*) AS n_events,
       {dsum_sql("value", "sum_value")}
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


@register("session_window_agg", oracle=_SESSION_ORACLE)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # cumulative window orders by (ts, event_id) too: with duplicate
    # (user_id, ts) rows a ts-only ROWS frame has engine-dependent peer
    # order, letting Spark and the oracle split tied rows into different
    # sessions
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap = F.expr(f"INTERVAL {_SESSION_GAP_MIN} MINUTES")
    prev_ts = F.lag("ts").over(w_order)
    new_session = (prev_ts.isNull() | (F.col("ts").cast("timestamp") - prev_ts > gap)).cast("long")
    return (
        events.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(w_cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), _FMT).alias("session_start"),
            F.date_format(F.max("ts"), _FMT).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# Interval (attribution) join: clicks -> purchases within the horizon
# ---------------------------------------------------------------------------

_ATTR_HORIZON_MIN = 60

_ATTR_ORACLE = f"""
WITH c AS (
    SELECT event_id AS click_id, user_id, ts AS cts
    FROM events WHERE event_type = 'click'
), p AS (
    SELECT event_id AS purchase_id, user_id, ts AS pts
    FROM events WHERE event_type = 'purchase'
)
SELECT c.click_id, p.purchase_id, c.user_id,
       CAST((epoch_us(p.pts) - epoch_us(c.cts)) // 1000000 AS BIGINT) AS gap_s
FROM c JOIN p
  ON p.user_id = c.user_id
 AND p.pts >= c.cts
 AND p.pts <= c.cts + INTERVAL {_ATTR_HORIZON_MIN} MINUTE
ORDER BY click_id, purchase_id
"""


@register("click_purchase_attribution", oracle=_ATTR_ORACLE, driver=False)
def click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: every purchase within {_ATTR_HORIZON_MIN} minutes
    after a click by the same user — the classic attribution shape, and
    the BATCH twin of the stream-stream join in
    streaming/stream_join.py (same condition, watermark-bounded state
    there; stream == batch asserted in tests/test_streaming.py).

    Shape: equi-join on user_id with a time-range residual — one
    shuffle on a high-cardinality key, the range predicate evaluated on
    the co-located pairs. Gap math in integer microseconds (the
    event_gaps_lag_lead convention), so both engines agree exactly."""
    ev = read_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("pts"),
    )
    us = F.unix_micros
    joined = c.join(
        p,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("pts") >= F.col("cts"))
        & (us(F.col("pts")) <= us(F.col("cts")) + _ATTR_HORIZON_MIN * 60 * 1_000_000),
    )
    return joined.select(
        "click_id",
        "purchase_id",
        "user_id",
        F.floor((us(F.col("pts")) - us(F.col("cts"))) / F.lit(1_000_000))
        .cast("long")
        .alias("gap_s"),
    ).orderBy("click_id", "purchase_id")


# ---------------------------------------------------------------------------
# Per-entity anomaly detection: expanding-window z-score on prior history
# ---------------------------------------------------------------------------

_ANOM_MIN_PRIOR = 8  # score only after this much per-user history
_ANOM_Z = 3.0  # |z| threshold vs the user's own prior distribution

_ANOM_ORACLE = f"""
WITH w AS (
    SELECT event_id, user_id, value,
           COUNT(value) OVER pw AS n_prior,
           CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER pw AS DOUBLE) AS s_prior,
           CAST(SUM(CAST(value * value AS DECIMAL(30,8))) OVER pw AS DOUBLE)
               AS q_prior
    FROM events
    WINDOW pw AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    )
), scored AS (
    SELECT event_id, user_id, value, n_prior,
           (value - s_prior / n_prior)
             / sqrt((q_prior - s_prior * s_prior / n_prior) / (n_prior - 1))
               AS z
    FROM w WHERE n_prior >= {_ANOM_MIN_PRIOR}
)
SELECT event_id, user_id, value, n_prior, ROUND(z, 6) AS z
FROM scored WHERE abs(z) > {_ANOM_Z}
ORDER BY user_id, event_id
"""


@register("event_value_anomalies", oracle=_ANOM_ORACLE, driver=False)
def event_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user anomaly detection: flag events whose value sits more
    than {_ANOM_Z} sample standard deviations from that user's OWN
    prior history (expanding window over earlier events only — no
    lookahead leak), once at least {_ANOM_MIN_PRIOR} prior events
    exist.

    Cross-engine exactness: the window sums Σx and Σx² go through the
    DECIMAL(30,8) order-independent path (functions/aggregates.py
    policy), then mean/variance/sqrt run in IEEE double on identical
    inputs — so Spark and DuckDB agree bit-for-bit and the flag
    boundary cannot flip between engines.

    Shape at 100 TB: ONE shuffle keyed by user_id (high cardinality,
    balanced); the expanding frame is computed in a single pass per
    partition group. The streaming twin
    (streaming/anomaly.py::streaming_anomalies) carries (n, Σx, Σx²)
    per user in state and scores each arriving event against history
    at that moment — same math, unbounded stream."""
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    pw = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dec = "decimal(30,8)"
    w = ev.select(
        "event_id",
        "user_id",
        "value",
        F.count("value").over(pw).alias("n_prior"),
        F.sum(F.col("value").cast(dec)).over(pw).cast("double").alias("s_prior"),
        F.sum((F.col("value") * F.col("value")).cast(dec)).over(pw).cast("double").alias("q_prior"),
    ).filter(F.col("n_prior") >= _ANOM_MIN_PRIOR)
    n = F.col("n_prior")
    mean = F.col("s_prior") / n
    var = (F.col("q_prior") - F.col("s_prior") * F.col("s_prior") / n) / (n - F.lit(1))
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        w.withColumn("z", z)
        .filter(F.abs(F.col("z")) > _ANOM_Z)
        .select("event_id", "user_id", "value", "n_prior", F.round("z", 6).alias("z"))
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution: linear-by-recency credit split
# ---------------------------------------------------------------------------

_MTA_ORACLE = f"""
WITH c AS (
    SELECT event_id AS click_id, user_id, ts AS cts
    FROM events WHERE event_type = 'click'
), p AS (
    SELECT event_id AS purchase_id, user_id, ts AS pts, value
    FROM events WHERE event_type = 'purchase'
), touches AS (
    SELECT p.purchase_id, c.click_id, c.user_id, p.value,
           row_number() OVER (
               PARTITION BY p.purchase_id ORDER BY c.cts, c.click_id
           ) AS touch_rank,
           COUNT(*) OVER (PARTITION BY p.purchase_id) AS n_touches
    FROM c JOIN p
      ON p.user_id = c.user_id
     AND p.pts >= c.cts
     AND p.pts <= c.cts + INTERVAL {_ATTR_HORIZON_MIN} MINUTE
)
SELECT purchase_id, click_id, user_id,
       CAST(touch_rank AS BIGINT) AS touch_rank,
       CAST(n_touches AS BIGINT) AS n_touches,
       ROUND(value * touch_rank * 2.0 / (n_touches * (n_touches + 1)), 9) AS credit
FROM touches
ORDER BY purchase_id, touch_rank
"""


@register("multi_touch_attribution", oracle=_MTA_ORACLE, driver=False)
def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-by-recency multi-touch attribution on top of the
    click->purchase interval join: each purchase's value is split
    across ALL clicks in its lookback window with weight proportional
    to recency rank (most recent touch gets n/(n(n+1)/2) of the value,
    oldest gets 1/...). Credits per purchase sum back to the purchase
    value by construction — the conservation law a reporting pipeline
    reconciles on.

    Scale notes: the interval join is the click_purchase_attribution
    shape (user-keyed equi-join + time residual); ranking is a window
    over purchase_id — bounded by touches-per-purchase, never a global
    sort. Credit arithmetic is value * rank * 2 / (n * (n+1)) in the
    same operation order in both engines, rounded to 9dp."""
    ev = read_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("pts"),
        "value",
    )
    us = F.unix_micros
    touches = c.join(
        p,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("pts") >= F.col("cts"))
        & (us(F.col("pts")) - us(F.col("cts")) <= _ATTR_HORIZON_MIN * 60 * 1_000_000),
    )
    w = Window.partitionBy("purchase_id").orderBy("cts", "click_id")
    wc = Window.partitionBy("purchase_id")
    return (
        touches.select(
            "purchase_id",
            "click_id",
            "user_id",
            "value",
            F.row_number().over(w).alias("touch_rank"),
            F.count(F.lit(1)).over(wc).alias("n_touches"),
        )
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            F.col("touch_rank").cast("long").alias("touch_rank"),
            F.col("n_touches").cast("long").alias("n_touches"),
            F.round(
                F.col("value")
                * F.col("touch_rank")
                * F.lit(2.0)
                / (F.col("n_touches") * (F.col("n_touches") + 1)),
                9,
            ).alias("credit"),
        )
        .orderBy("purchase_id", "touch_rank")
    )


# ---------------------------------------------------------------------------
# OHLC resampling (time-series downsample to bar aggregates)
# ---------------------------------------------------------------------------

_OHLC_ORACLE = """
WITH t AS (
    SELECT date_trunc('hour', ts) AS bar_ts, ts, event_id, value
    FROM events
    WHERE event_type = 'purchase' AND value IS NOT NULL
), r AS (
    SELECT bar_ts, value,
           ROW_NUMBER() OVER (PARTITION BY bar_ts ORDER BY ts, event_id) AS rn_a,
           ROW_NUMBER() OVER (PARTITION BY bar_ts ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM t
)
SELECT bar_ts,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS volume
FROM r
GROUP BY bar_ts
ORDER BY bar_ts
"""


@register("ohlc_purchase_hourly", oracle=_OHLC_ORACLE, driver=False)
def ohlc_purchase_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: hourly purchase-value bars — the canonical
    time-series resample (ticks -> candles) as ONE partial-aggregable
    pass, no window sort. open/close are argmin/argmax by (ts,
    event_id) via the engine's ordered-struct trick (the
    latest_order_per_customer shape): min/max of
    struct(ts, event_id, value) pick the first/last event's value with
    a deterministic tie-break, and struct extrema combine
    map-side — at 100 TB this shuffles ~n_bars rows, where a
    row_number-over-window formulation would shuffle and sort every
    tick. The DuckDB oracle deliberately IS that window formulation
    (ROW_NUMBER asc/desc over the same (ts, event_id) order) — an
    independent plan shape for the same argmin/argmax semantics, so a
    tie-break or struct-comparison bug flips the row. The plan test
    pins that the Spark side stays aggregate-only (no Window node)."""
    events = (
        read_table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .select(
            F.date_trunc("hour", F.col("ts")).alias("bar_ts"),
            "ts",
            "event_id",
            "value",
        )
    )
    first = F.min(F.struct("ts", "event_id", "value")).getField("value")
    last = F.max(F.struct("ts", "event_id", "value")).getField("value")
    return (
        events.groupBy("bar_ts")
        .agg(
            first.alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            last.alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
        .orderBy("bar_ts")
    )
