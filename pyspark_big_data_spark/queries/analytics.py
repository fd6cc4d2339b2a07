"""Core analytics queries beyond the four reference shapes.

These widen operator coverage (multi-aggregate with derived expressions,
deep join trees over broadcast dims, positional union, semi-join-style
IN filters) and demonstrate the engine's exact-aggregation policy
(functions/aggregates.py) that keeps double sums deterministic under any
partitioning — a correctness property the reference never had to face on
its 2-node cluster but that matters on 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.functions.aggregates import davg, davg_sql, dsum, dsum_sql
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_CUTOFF = "TIMESTAMP '1998-09-02 00:00:00'"

_PRICING_ORACLE = f"""
SELECT l_returnflag,
       l_linestatus,
       {dsum_sql("l_quantity", "sum_qty")},
       {dsum_sql("l_extendedprice", "sum_base_price")},
       {dsum_sql("l_extendedprice * (1.0 - l_discount)", "sum_disc_price")},
       {dsum_sql("(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)", "sum_charge")},
       {davg_sql("l_quantity", "avg_qty")},
       {davg_sql("l_extendedprice", "avg_price")},
       {davg_sql("l_discount", "avg_disc")},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= {_CUTOFF}
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("pricing_summary", oracle=_PRICING_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter -> wide multi-aggregate.

    One shuffle (tiny: #groups = |returnflag| x |linestatus|); all eight
    aggregates compute in a single partial+final HashAggregate pair over
    one scan. Filter and 6-column projection push into the parquet scan.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(F.expr(f"l_shipdate <= {_CUTOFF}"))
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_REVENUE_ORACLE = f"""
SELECT n.n_name,
       {dsum_sql("l.l_extendedprice * (1.0 - l.l_discount)", "revenue")},
       COUNT(*) AS n_items
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name ASC
"""


@register("revenue_by_nation", oracle=_REVENUE_ORACLE)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped deep join tree: region->nation broadcast down onto
    the customer->orders->lineitem fact chain.

    Scale notes: region/nation are broadcast (no shuffle); the fact chain
    joins are key-partitioned and AQE-managed. The region IN-filter
    applies before the broadcast, shrinking the build side; the orderdate
    predicate pushes into the orders scan.
    """
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    nation = read_table(spark, sf_dir, "nation")
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.expr("o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'")
    )
    lineitem = read_table(spark, sf_dir, "lineitem")

    dims = F.broadcast(
        nation.join(region, nation["n_regionkey"] == region["r_regionkey"]).select(
            "n_nationkey", "n_name"
        )
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        customer.join(dims, customer["c_nationkey"] == dims["n_nationkey"])
        .join(orders, F.col("c_custkey") == orders["o_custkey"])
        .join(lineitem, F.col("o_orderkey") == lineitem["l_orderkey"])
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


_SALTED_ORACLE = f"""
SELECT c.c_nationkey, COUNT(*) AS n_events,
       {dsum_sql("e.value", "value_sum")}
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1
ORDER BY c_nationkey
"""


@register("salted_skew_join", oracle=_SALTED_ORACLE, driver=False)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The J7 skew-salting path driver-verifiable (it was pytest-only:
    `operators/joins.py::salted_join` + the AQE skew-split plan test):
    join the events fact table — whose user_id key set is small and hot
    (~67 events/key at sf0.01, the straggler shape) — to customer
    through the SALTED join (deterministic xxhash row salt on the probe
    side, build side replicated num_salts ways, equi-join on
    (key, salt)), then aggregate per nation. Salting must be
    semantics-invisible: the oracle is the PLAIN join's SQL, so a salt
    that drops rows, double-joins a replica, or breaks the equi-key
    flips the row red. Scale shape: each hot key spreads over
    num_salts shuffle partitions; build-side cost ×num_salts is paid on
    the dimension, never the fact table."""
    from pyspark_big_data_spark.operators.joins import salted_join

    ev = read_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "value"
    )
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    joined = salted_join(ev, cust, "c_custkey", num_salts=8)
    return (
        joined.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "value_sum"),
        )
        .orderBy("c_nationkey")
    )


_UNION_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS cnt
FROM (
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderpriority FROM orders WHERE o_totalprice > 300000.0
)
GROUP BY o_orderpriority
ORDER BY cnt DESC, o_orderpriority ASC
"""


@register("union_priority_counts", oracle=_UNION_ORACLE)
def union_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional UNION ALL of two filtered scans (U1,
    == ``src/query1.py:25``), then group-count. The engine prefers
    unionByName whenever schemas are declared — positional union silently
    miscombines if column order drifts."""
    orders = read_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    b = orders.filter(F.col("o_totalprice") > 300000.0).select("o_orderpriority")
    return (
        a.unionByName(b)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("o_orderpriority").asc())
    )


_SETOPS_ORACLE = """
WITH hi AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 200000.0),
     recent AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
SELECT 'both' AS set_kind, COUNT(*) AS cnt FROM (SELECT * FROM hi INTERSECT SELECT * FROM recent)
UNION ALL
SELECT 'hi_only', COUNT(*) FROM (SELECT * FROM hi EXCEPT SELECT * FROM recent)
UNION ALL
SELECT 'recent_only', COUNT(*) FROM (SELECT * FROM recent EXCEPT SELECT * FROM hi)
ORDER BY set_kind
"""


@register("customer_set_ops", oracle=_SETOPS_ORACLE, driver=False)
def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (absent from the reference, SURVEY.md §2.7):
    customers with big orders vs recently active — both plan as
    aggregate-free left-semi / left-anti joins under Catalyst."""
    orders = read_table(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") > 200000.0).select("o_custkey").distinct()
    recent = (
        orders.filter(F.expr("o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'"))
        .select("o_custkey")
        .distinct()
    )
    counts = [
        hi.intersect(recent).agg(F.count(F.lit(1)).alias("cnt")).select(
            F.lit("both").alias("set_kind"), "cnt"
        ),
        hi.exceptAll(recent).agg(F.count(F.lit(1)).alias("cnt")).select(
            F.lit("hi_only").alias("set_kind"), "cnt"
        ),
        recent.exceptAll(hi).agg(F.count(F.lit(1)).alias("cnt")).select(
            F.lit("recent_only").alias("set_kind"), "cnt"
        ),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.orderBy("set_kind")


_CUBE_ORACLE = """
SELECT COALESCE(o_orderstatus, '<all>') AS status,
       COALESCE(o_orderpriority, '<all>') AS priority,
       COUNT(*) AS cnt
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


@register("cube_status_priority", oracle=_CUBE_ORACLE)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations in one pass."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "cnt",
        )
        .orderBy("status", "priority")
    )


_PRIORITY_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("order_priority_semi_join", oracle=_PRIORITY_ORACLE)
def order_priority_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelates to a LEFT SEMI join — an
    operator family the reference lacks entirely (SURVEY.md §2.3 notes
    inner joins only). Semi joins matter at scale: the probe side never
    duplicates rows, so no fan-out blowup."""
    orders = read_table(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP '1996-07-01 00:00:00' AND "
            "o_orderdate < TIMESTAMP '1996-10-01 00:00:00'"
        )
    )
    lineitem = read_table(spark, sf_dir, "lineitem")
    matched = orders.join(
        lineitem,
        (orders["o_orderkey"] == lineitem["l_orderkey"])
        & (lineitem["l_shipdate"] > orders["o_orderdate"]),
        "left_semi",
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_ANTI_ORACLE = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
)
ORDER BY c.c_custkey
"""


@register("customers_without_orders", oracle=_ANTI_ORACLE, driver=False)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with NO orders in 1996: NOT EXISTS decorrelates to a
    LEFT ANTI join — the complement of order_priority_semi_join's
    family. Anti joins share the semi join's scale property (the probe
    side never duplicates rows); the build side here is the 1996
    o_custkey set, and the date filter pushes to the orders scan."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND "
            "o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"
        )
    ).select("o_custkey")
    return (
        customer.join(orders, customer["c_custkey"] == orders["o_custkey"], "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


_GSETS_ORACLE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(c_mktsegment, 'ALL') AS segment,
       COUNT(*) AS n_orders
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY GROUPING SETS ((o_orderstatus), (c_mktsegment),
                        (o_orderstatus, c_mktsegment), ())
ORDER BY status, segment
"""


@register("grouping_sets_status_segment", oracle=_GSETS_ORACLE)
def grouping_sets_status_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the DataFrame API
    (``df.groupingSets`` — the Spark 4 native form, no SQL detour):
    per-status, per-segment, the cross, and the grand total in ONE
    Expand-based aggregate pass instead of four scans. Completes the
    hypertable-rollup family next to CUBE (cube_status_priority) and
    ROLLUP (rollup_lineitem_status)."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    joined = orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
    return (
        joined.groupingSets(
            [["o_orderstatus"], ["c_mktsegment"], ["o_orderstatus", "c_mktsegment"], []],
            "o_orderstatus",
            "c_mktsegment",
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "n_orders",
        )
        .orderBy("status", "segment")
    )


_NULLSAFE_ORACLE = """
WITH coded AS (
    SELECT user_id % 10 AS bucket,
           NULLIF(event_type, 'error') AS code,
           CASE WHEN EXTRACT(DAY FROM ts) <= 15 THEN 1 ELSE 2 END AS half
    FROM events
), a AS (
    SELECT bucket, code, COUNT(*) AS n_first
    FROM coded WHERE half = 1 GROUP BY 1, 2
), b AS (
    SELECT bucket, code, COUNT(*) AS n_second
    FROM coded WHERE half = 2 GROUP BY 1, 2
)
SELECT a.bucket AS bucket, COALESCE(a.code, 'NULL') AS code,
       a.n_first, b.n_second
FROM a JOIN b ON a.bucket = b.bucket AND a.code IS NOT DISTINCT FROM b.code
ORDER BY a.bucket, code
"""


@register("null_safe_code_join", oracle=_NULLSAFE_ORACLE)
def null_safe_code_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``eqNullSafe`` / IS NOT DISTINCT FROM):
    month-half event counts matched on (bucket, code) where code is
    deliberately NULL for error events — a plain ``=`` would silently
    drop every NULL-code group, the classic three-valued-logic join
    bug. The null-safe key keeps them matched in both engines."""
    ev = read_table(spark, sf_dir, "events")
    coded = ev.select(
        (F.col("user_id") % 10).alias("bucket"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("code"),
        F.when(F.dayofmonth("ts") <= 15, 1).otherwise(2).alias("half"),
    )
    a = (
        coded.filter(F.col("half") == 1)
        .groupBy("bucket", "code")
        .agg(F.count(F.lit(1)).alias("n_first"))
    )
    b = (
        coded.filter(F.col("half") == 2)
        .groupBy(F.col("bucket").alias("b_bucket"), F.col("code").alias("b_code"))
        .agg(F.count(F.lit(1)).alias("n_second"))
    )
    return (
        a.join(
            b,
            (F.col("bucket") == F.col("b_bucket"))
            & F.col("code").eqNullSafe(F.col("b_code")),
        )
        .select(
            "bucket",
            F.coalesce("code", F.lit("NULL")).alias("code"),
            "n_first",
            "n_second",
        )
        .orderBy("bucket", "code")
    )


_LATEST_ORDER_ORACLE = """
SELECT o_custkey AS custkey,
       o_orderdate AS last_orderdate,
       o_orderkey AS last_orderkey,
       o_totalprice AS last_totalprice,
       o_orderstatus AS last_status
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
    ) AS rn
    FROM orders
)
WHERE rn = 1
ORDER BY custkey
"""


@register("latest_order_per_customer", oracle=_LATEST_ORDER_ORACLE, driver=False)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1-per-group WITHOUT a window sort: max over an ordered struct.

    ``max(struct(ts, key, payload...))`` is an ordinary aggregate, so it
    gets map-side partial aggregation (each input partition collapses to
    at most one row per group BEFORE the exchange) — unlike the
    row_number window, which must shuffle every row of the fact table
    and sort each partition. At 100 TB with a bounded group count this
    is the difference between shuffling ~n_groups rows and shuffling the
    whole table; it is also the canonical CDC "latest record wins"
    compaction shape (operators/upsert.py uses the same idea keyed on
    batch ordinal). The struct's field order IS the comparison order:
    event time first, unique key as the deterministic tie-break, payload
    fields after (never reached, key is unique). Oracle: the equivalent
    row_number()=1 query — two independent plans, one result.
    """
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy("o_custkey").agg(
        F.max(
            F.struct("o_orderdate", "o_orderkey", "o_totalprice", "o_orderstatus")
        ).alias("m")
    )
    return (
        m.select(
            F.col("o_custkey").alias("custkey"),
            F.col("m.o_orderdate").alias("last_orderdate"),
            F.col("m.o_orderkey").alias("last_orderkey"),
            F.col("m.o_totalprice").alias("last_totalprice"),
            F.col("m.o_orderstatus").alias("last_status"),
        )
        .orderBy("custkey")
    )


_VOLUME_ORACLE = f"""
SELECT ns.n_name AS supp_nation,
       nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
       {dsum_sql("l.l_extendedprice * (1.0 - l.l_discount)", "volume")},
       COUNT(*) AS n_items
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE ns.n_name <> nc.n_name
  AND ns.n_name IN ('NATION_1', 'NATION_7', 'NATION_13')
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
"""


@register("nation_volume_shipping", oracle=_VOLUME_ORACLE, driver=False)
def nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped join topology: TWO independent dimension branches
    (supplier->nation and customer->orders->nation) meeting on the
    lineitem fact, with a cross-branch inequality (supp <> cust nation)
    that can only apply AFTER both branches attach.

    Scale notes vs the Q5 shape (revenue_by_nation): Q5 is one linear
    dim chain; here the planner must pick an order for two branch
    attachments. supplier x nation broadcasts onto lineitem (no fact
    shuffle), then the orders/customer branch joins key-partitioned;
    the IN-filter on the SUPPLIER branch prunes most fact rows before
    the expensive branch. The <> predicate is a residual filter, never
    a join explosion — both attachments stay equi-joins."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")

    supp_dim = F.broadcast(
        supplier.join(nation, supplier["s_nationkey"] == nation["n_nationkey"])
        .filter(F.col("n_name").isin("NATION_1", "NATION_7", "NATION_13"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_dim = customer.join(
        F.broadcast(nation),
        customer["c_nationkey"] == nation["n_nationkey"],
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))

    volume = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.join(supp_dim, lineitem["l_suppkey"] == supp_dim["s_suppkey"])
        .join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(cust_dim, orders["o_custkey"] == cust_dim["c_custkey"])
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(dsum(volume, "volume"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


_ABOVE_AVG_ORACLE = """
WITH ca AS (
    SELECT o_custkey,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS cust_avg
    FROM orders GROUP BY o_custkey
)
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, ca.cust_avg
FROM orders o JOIN ca ON ca.o_custkey = o.o_custkey
WHERE o.o_totalprice > ca.cust_avg
ORDER BY o.o_orderkey
"""


@register("orders_above_customer_avg", oracle=_ABOVE_AVG_ORACLE, driver=False)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL surface: each order
    compared against ITS customer's average price. Catalyst must
    DECORRELATE this into one aggregate + one join (RewriteCorrelated
    ScalarSubquery) — executing the subquery per outer row, the naive
    reading, would be n_orders aggregate scans. The plan test pins the
    decorrelated shape; the oracle spells the decorrelation by hand, so
    agreement also confirms the rewrite preserved semantics.

    Determinism: the correlated average is a decimal-exact sum/count
    rounded to 6dp in BOTH engines before the comparison, so boundary
    rows cannot flip on summation order."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_corr_v")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
               (SELECT ROUND(CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,12))) AS DOUBLE)
                             / COUNT(*), 6)
                FROM orders_corr_v o2
                WHERE o2.o_custkey = o.o_custkey) AS cust_avg
        FROM orders_corr_v o
        WHERE o.o_totalprice >
              (SELECT ROUND(CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,12))) AS DOUBLE)
                            / COUNT(*), 6)
               FROM orders_corr_v o2
               WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o.o_orderkey
        """
    )
