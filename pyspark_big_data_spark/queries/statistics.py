"""Statistical aggregates, array aggregation, and unpivot/melt.

stddev/corr are computed from decimal-exact moment sums (sum, sum of
squares, sum of products) rather than the built-in accumulators — the
built-ins are numerically fine but order-dependent in the last bits,
which breaks cross-engine hash equality AND bit-reproducibility across
cluster re-plans. Same one-pass cost: all moments come from a single
partial+final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_DEC = "decimal(38,12)"


def _s(expr) -> F.Column:
    return F.sum(expr.cast(_DEC)).cast("double")


def _s_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,12))) AS DOUBLE)"


_STATS_ORACLE = f"""
WITH m AS (
    SELECT l_returnflag,
           COUNT(*) AS n,
           {_s_sql("l_quantity")} AS sx,
           {_s_sql("l_quantity * l_quantity")} AS sxx,
           {_s_sql("l_extendedprice")} AS sy,
           {_s_sql("l_extendedprice * l_extendedprice")} AS syy,
           {_s_sql("l_quantity * l_extendedprice")} AS sxy
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT l_returnflag,
       n,
       ROUND(sx / n, 6) AS mean_qty,
       ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
       ROUND((sxy - sx * sy / n)
             / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6) AS corr_qty_price
FROM m
ORDER BY l_returnflag
"""


@register("stats_by_returnflag", oracle=_STATS_ORACLE, driver=False)
def stats_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / sample stddev / Pearson correlation from exact moment sums
    (one aggregate pass; deterministic under any partitioning)."""
    li = read_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        _s(q).alias("sx"),
        _s(q * q).alias("sxx"),
        _s(p).alias("sy"),
        _s(p * p).alias("syy"),
        _s(q * p).alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ["n", "sx", "sxx", "sy", "syy", "sxy"])
    return m.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 6).alias("mean_qty"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("stddev_qty"),
        F.round(
            (sxy - sx * sy / n) / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)), 6
        ).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


_ARRAY_ORACLE = """
SELECT o_custkey,
       COUNT(*) AS n_orders,
       array_to_string(array_agg(o_orderkey ORDER BY o_orderkey), ',') AS orderkeys
FROM orders
WHERE o_custkey % 50 = 0
GROUP BY o_custkey
ORDER BY o_custkey
"""


@register("orders_per_customer_array", oracle=_ARRAY_ORACLE, driver=False)
def orders_per_customer_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list with deterministic ordering (sort_array) — emitted as
    a joined string so the oracle comparison is representation-proof.
    Unbounded collect_list is a scale hazard; the % 50 probe filter
    mirrors how you'd bound it (or use slice(sort_array(...), 1, k))."""
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.array_join(F.sort_array(F.collect_list("o_orderkey")), ",").alias("orderkeys"),
        )
        .orderBy("o_custkey")
    )


_UNPIVOT_ORACLE = """
WITH agg AS (
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(30,8))) AS DOUBLE) AS sum_disc
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, metric, value FROM (
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
)
ORDER BY l_returnflag, metric
"""


@register("unpivot_lineitem_metrics", oracle=_UNPIVOT_ORACLE, driver=False)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long reshaping with DataFrame.unpivot (melt)."""
    from pyspark_big_data_spark.functions.aggregates import dsum

    li = read_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_price"),
        dsum("l_discount", "sum_disc"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("l_returnflag", "metric")


_ZSCORE_ORACLE = f"""
WITH m AS (
    SELECT event_type,
           COUNT(*) AS n,
           {_s_sql("value")} AS sx,
           {_s_sql("value * value")} AS sxx
    FROM events
    GROUP BY event_type
)
SELECT e.event_id,
       e.event_type,
       e.value,
       ROUND((e.value - m.sx / m.n)
             / sqrt((m.sxx - m.sx * m.sx / m.n) / (m.n - 1)), 6) AS zscore
FROM events e JOIN m ON m.event_type = e.event_type
ORDER BY e.event_id
"""


@register("value_zscore_by_type", oracle=_ZSCORE_ORACLE, driver=False)
def value_zscore_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise z-score normalization — the feature-engineering
    standardization step (per-slice mean/std, then broadcast back onto
    the rows). Two-pass shape: the per-group moments are ONE partial
    aggregate (decimal-exact sums, so the stats are partitioning-
    independent), broadcast onto the fact as a tiny dim — at 100 TB
    this is a scan + a |groups|-row broadcast join, the same plan
    z-scoring a training feature runs. (A Window.partitionBy twin would
    shuffle the whole fact by group — deliberately avoided.)"""
    ev = read_table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _s(F.col("value")).alias("sx"),
        _s(F.col("value") * F.col("value")).alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    return (
        ev.join(F.broadcast(m), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.round((F.col("value") - mean) / F.sqrt(var), 6).alias("zscore"),
        )
        .orderBy("event_id")
    )


_COPURCHASE_TOP = 20

_COPURCHASE_ORACLE = f"""
WITH op AS (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS part
    FROM lineitem
)
SELECT a.part AS part_a,
       b.part AS part_b,
       CAST(COUNT(*) AS BIGINT) AS support
FROM op a JOIN op b ON a.ok = b.ok AND a.part < b.part
GROUP BY part_a, part_b
ORDER BY support DESC, part_a, part_b
LIMIT {_COPURCHASE_TOP}
"""


@register("copurchase_part_pairs", oracle=_COPURCHASE_ORACLE, driver=False)
def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_COPURCHASE_TOP} co-purchased part pairs by support — the
    first level of frequent-itemset mining (A-priori L2 on basket
    data), and the input to 'bought-together' recommenders.

    Scale notes: the within-basket self-join is keyed on the ORDER —
    the pair bill is Σ per-basket items², bounded by basket size (a
    handful), never corpus²; the pair aggregate is one shuffle on the
    pair key and the top-N is TakeOrderedAndProject. The degenerate
    version of this query (join on the ITEM, i.e. 'any shared part')
    is the Σ df² blowup the prefix-filter and LSH modules exist to
    avoid — basket-keyed is the safe orientation."""
    li = read_table(spark, sf_dir, "lineitem")
    op = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part")).distinct()
    a = op.select("ok", F.col("part").alias("part_a"))
    b = op.select(F.col("ok").alias("ok_b"), F.col("part").alias("part_b"))
    return (
        a.join(b, (F.col("ok") == F.col("ok_b")) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.col("support").desc(), "part_a", "part_b")
        .limit(_COPURCHASE_TOP)
    )


# ---------------------------------------------------------------------------
# A/B experiment readout (Welch's t-test)
# ---------------------------------------------------------------------------

_AB_SEED = "exp1:"  # deterministic arm assignment: hash48(seed||user) % 2

_AB_ORACLE = f"""
WITH u AS (
    SELECT user_id,
           (('0x' || substr(md5('{_AB_SEED}' || CAST(user_id AS VARCHAR)), 1, 12))::BIGINT) % 2 AS arm,
           {_s_sql("value")} AS y
    FROM events
    GROUP BY user_id
), m AS (
    SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           {_s_sql("CASE WHEN arm = 0 THEN y ELSE 0 END")} AS sa,
           {_s_sql("CASE WHEN arm = 0 THEN y * y ELSE 0 END")} AS saa,
           {_s_sql("CASE WHEN arm = 1 THEN y ELSE 0 END")} AS sb,
           {_s_sql("CASE WHEN arm = 1 THEN y * y ELSE 0 END")} AS sbb
    FROM u
)
SELECT n_a, n_b,
       ROUND(sa / n_a, 6) AS mean_a,
       ROUND(sb / n_b, 6) AS mean_b,
       ROUND(sa / n_a - sb / n_b, 6) AS lift,
       ROUND((sa / n_a - sb / n_b)
             / sqrt(((saa - sa * sa / n_a) / (n_a - 1)) / n_a
                    + ((sbb - sb * sb / n_b) / (n_b - 1)) / n_b), 6) AS t_stat,
       ROUND(pow(((saa - sa * sa / n_a) / (n_a - 1)) / n_a
                 + ((sbb - sb * sb / n_b) / (n_b - 1)) / n_b, 2)
             / (pow(((saa - sa * sa / n_a) / (n_a - 1)) / n_a, 2) / (n_a - 1)
                + pow(((sbb - sb * sb / n_b) / (n_b - 1)) / n_b, 2) / (n_b - 1)), 6) AS welch_df
FROM m
"""


@register("ab_test_readout", oracle=_AB_ORACLE, driver=False)
def ab_test_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: deterministic hash-bucket arm assignment,
    USER-level analysis units (per-user value total first, so
    within-user event correlation can't shrink the variance — the
    classic event-level-t-test mistake), then Welch's unequal-variance
    t statistic and Welch-Satterthwaite df from decimal-exact moments.

    Shape: one shuffle keyed by user (the per-user metric), then a
    2-group conditional aggregate with map-side partial combine — the
    readout is a single row regardless of corpus size. Arm assignment
    is the same engine-portable seeded hash the samplers use, so a
    re-run, an engine swap, or an incremental extension of the event
    log cannot reshuffle users between arms."""
    from pyspark_big_data_spark.functions.text import hash48

    ev = read_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(_s(F.col("value")).alias("y")).select(
        (hash48(F.concat(F.lit(_AB_SEED), F.col("user_id").cast("string"))) % 2).alias("arm"),
        "y",
    )
    m = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        _s(F.when(F.col("arm") == 0, F.col("y")).otherwise(0)).alias("sa"),
        _s(F.when(F.col("arm") == 0, F.col("y") * F.col("y")).otherwise(0)).alias("saa"),
        _s(F.when(F.col("arm") == 1, F.col("y")).otherwise(0)).alias("sb"),
        _s(F.when(F.col("arm") == 1, F.col("y") * F.col("y")).otherwise(0)).alias("sbb"),
    )
    n_a, n_b, sa, saa, sb, sbb = (F.col(c) for c in ["n_a", "n_b", "sa", "saa", "sb", "sbb"])
    va_n = ((saa - sa * sa / n_a) / (n_a - 1)) / n_a  # Var_a / n_a
    vb_n = ((sbb - sb * sb / n_b) / (n_b - 1)) / n_b
    return m.select(
        "n_a",
        "n_b",
        F.round(sa / n_a, 6).alias("mean_a"),
        F.round(sb / n_b, 6).alias("mean_b"),
        F.round(sa / n_a - sb / n_b, 6).alias("lift"),
        F.round((sa / n_a - sb / n_b) / F.sqrt(va_n + vb_n), 6).alias("t_stat"),
        F.round(
            F.pow(va_n + vb_n, 2)
            / (F.pow(va_n, 2) / (n_a - 1) + F.pow(vb_n, 2) / (n_b - 1)),
            6,
        ).alias("welch_df"),
    )


_GRP_PCT_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("percentiles_by_priority", oracle=_GRP_PCT_ORACLE, driver=False)
def percentiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-GROUP percentiles (Spark `percentile` == DuckDB
    `quantile_cont`, linear interpolation): the grouped companion to
    the global `price_percentiles`. One hash-aggregate keyed by the
    group column; per-group state is the group's value multiset, fine
    while groups are driver-of-magnitude smaller than the table (5
    priorities here). At 100 TB with heavy groups the swap is
    `percentile_approx` (bounded-memory Greenwald-Khanna sketch, same
    call shape, mergeable across partitions) — its error bound is
    gated against the exact path in tests/test_operators.py."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


_AQ_ACC = 10000  # percentile_approx accuracy: rank error <= n/_AQ_ACC
_AQ_QS = [0.25, 0.5, 0.75]

_AQ_ORACLE = f"""
SELECT CAST(COUNT(DISTINCT o_orderpriority) * {len(_AQ_QS)} AS BIGINT) AS n_checks,
       CAST(CASE WHEN COUNT(*) > 0 THEN 1 ELSE 0 END AS BIGINT) AS gate_ok
FROM orders
"""


@register("approx_quantile_witness", oracle=_AQ_ORACLE, driver=False)
def approx_quantile_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver witness for the APPROXIMATE quantile sketch — the
    bounded-memory, mergeable member of the sketch family
    (Greenwald–Khanna via ``percentile_approx``; HLL / CMS / Bloom /
    freqItems / SpaceSaving each already carry one). Per priority
    group and per quantile in {_AQ_QS}, the sketch's returned element
    must have an exact rank interval [#{{< v}}+1, #{{<= v}}] that
    intersects [q*n - n/{_AQ_ACC} - 1, q*n + n/{_AQ_ACC} + 1] — the
    sketch's documented rank-error contract, verified against an
    EXACT rank count (tie-robust: the interval form absorbs duplicate
    value mass). Digest is the witness-standard (n_checks, gate_ok);
    n_checks is independently recomputed by DuckDB.

    Scale shape: the sketch aggregate is one scan with map-side
    mergeable state; the verification is one more scan against the
    15-row broadcast of sketch outputs. At 100 TB the exact companion
    (percentiles_by_priority's full multiset per group) is the one
    that must be retired — this sketch is its swap, and this row is
    the evidence the swap is safe."""
    o = read_table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    ap = o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", _AQ_QS, _AQ_ACC).alias("qs"),
        F.count(F.lit(1)).alias("n"),
    )
    probes = ap.select(
        "o_orderpriority", "n", F.posexplode("qs").alias("qi", "qv")
    )
    ranked = (
        o.join(F.broadcast(probes), "o_orderpriority")
        .groupBy("o_orderpriority", "qi", "qv", "n")
        .agg(
            F.sum(
                F.when(F.col("o_totalprice") < F.col("qv"), 1).otherwise(0)
            ).alias("rk_lo"),
            F.sum(
                F.when(F.col("o_totalprice") <= F.col("qv"), 1).otherwise(0)
            ).alias("rk_hi"),
        )
    )
    target = (F.col("qi") + 1) * F.lit(1.0 / 4) * F.col("n")
    tol = F.col("n") / F.lit(float(_AQ_ACC)) + F.lit(1.0)
    ok = ((F.col("rk_lo") + 1) <= target + tol) & (F.col("rk_hi") >= target - tol)
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_checks"),
        F.min(F.when(ok, 1).otherwise(0)).alias("_okmin"),
    )
    gate = F.when((F.col("_okmin") == 1) & (F.col("n_checks") > 0), 1).otherwise(0)
    return agg.select("n_checks", gate.cast("long").alias("gate_ok"))


# ---------------------------------------------------------------------------
# Decimal-exact Pearson correlation (per segment)
# ---------------------------------------------------------------------------

_CORR_ORACLE = """
WITH j AS (
    SELECT c.c_mktsegment AS segment,
           c.c_acctbal AS x, o.o_totalprice AS y
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
), m AS (
    SELECT segment,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
           CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy
    FROM j GROUP BY segment
)
SELECT segment,
       CAST(n AS BIGINT) AS n_pairs,
       ROUND((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9) AS pearson_r
FROM m
ORDER BY segment
"""


@register("price_balance_correlation", oracle=_CORR_ORACLE, driver=False)
def price_balance_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson r between customer balance and order price, per segment.

    Spark has F.corr, but its streaming-moment implementation sums
    doubles in partition order — nondeterministic run-to-run and
    engine-to-engine. The engine's shape instead: the five raw moments
    as DECIMAL(38,12)-exact sums (order-independent, one aggregate
    pass), then ONE fixed-order double expression — the same policy as
    the z-score and PageRank rows, giving a bit-stable r that DuckDB
    reproduces term for term."""
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    j = c.join(o, c["c_custkey"] == o["o_custkey"]).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("x"),
        F.col("o_totalprice").alias("y"),
    )
    dec = "decimal(38,12)"
    m = j.groupBy("segment").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    r = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select(
        "segment",
        n.cast("long").alias("n_pairs"),
        F.round(r, 9).alias("pearson_r"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# MAD (median absolute deviation) robust outliers per event type
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH med AS (
    SELECT event_type, quantile_cont(value, 0.5) AS med
    FROM events WHERE value IS NOT NULL GROUP BY event_type
), dev AS (
    SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
    FROM events e JOIN med m ON m.event_type = e.event_type
    WHERE e.value IS NOT NULL
), mad AS (
    SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type,
       COUNT(*) AS n_values,
       CAST(SUM(CASE WHEN abs(d.value - d.med) > 3.0 * m2.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       ROUND(ANY_VALUE(d.med), 6) AS med,
       ROUND(ANY_VALUE(m2.mad), 6) AS mad
FROM dev d JOIN mad m2 ON m2.event_type = d.event_type
GROUP BY d.event_type
ORDER BY d.event_type
"""


@register("value_mad_outliers", oracle=_MAD_ORACLE, driver=False)
def value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census: |v - median| > 3 * MAD per event type.

    The z-score row (value_zscore_by_type) is mean/std — one wild
    value inflates its own yardstick. MAD is the robust twin: two
    grouped EXACT percentile passes (Spark `percentile` == DuckDB
    quantile_cont, the parity price_percentiles pins) with the
    group-level medians broadcast-joined back onto the fact — never a
    per-row window over the whole table. At 100 TB both passes become
    percentile_approx with the same plan shape."""
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med")) > 3.0 * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Geometric mean per group: decimal-exact tier + GROUPED_AGG pandas tier
# ---------------------------------------------------------------------------

_GEO_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(ROUND(ln(o_totalprice), 9) AS DECIMAL(38,12))) AS DOUBLE)
             / COUNT(*), 6) AS log_geomean
FROM orders
WHERE o_totalprice > 0
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("geomean_price_by_priority", oracle=_GEO_ORACLE, driver=False)
def geomean_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-space geometric mean of order prices per priority.

    Kept in LOG SPACE on purpose: exp() is a libm call whose last ulp
    differs between the JVM and C runtimes, while the engine's
    9dp-rounded-ln + decimal-exact-sum device (the DSIR rows' policy)
    makes the log mean bit-stable across engines. The Arrow
    GROUPED_AGG twin below exercises the remaining cell of the UDF
    surface matrix and is agreement-gated against this tier in
    pytest."""
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    lg = F.round(F.log(F.col("o_totalprice")), 9).cast("decimal(38,12)")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                (F.sum(lg).cast("double") / F.count(F.lit(1))), 6
            ).alias("log_geomean"),
        )
        .orderBy("o_orderpriority")
    )


@register("geomean_price_grouped_agg_udf", driver=False)
def geomean_price_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF twin of geomean_price_by_priority — the
    one UDF shape the engine had not yet exercised (scalar udf, pandas
    scalar, SQL udf, UDTF, mapInPandas, applyInPandas(+WithState) all
    have rows). The aggregation runs as Arrow batches per group with
    numpy doing the mean; float64 summation order makes it a rows-only
    tier (no bit-exact SQL twin), agreement-gated against the
    decimal-exact oracled tier in tests/test_udf_surface.py — the same
    policy as every BLAS fast tier."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed EXPLICITLY: this module's `from __future__
    # import annotations` stringifies signatures, which defeats
    # pandas_udf's annotation-based GROUPED_AGG inference.
    def _log_geomean(prices):
        import numpy as np

        return float(np.log(prices.to_numpy(np.float64)).round(9).mean())

    log_geomean = pandas_udf(_log_geomean, "double", PandasUDFType.GROUPED_AGG)

    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    # a GROUPED_AGG UDF cannot share an agg with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT), so the tier emits only the UDF
    # measure; the agreement test compares it against the oracled tier
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.round(log_geomean(F.col("o_totalprice")), 6).alias("log_geomean"))
        .orderBy("o_orderpriority")
    )
