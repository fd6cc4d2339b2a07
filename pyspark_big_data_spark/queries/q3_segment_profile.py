"""Q3 shape: profile dimension of top/bottom-k groups — multi-join with
strategy hints and a two-phase driver round-trip.

Reference semantics: ``src/query3.py`` — 3-way inner join with per-join
strategy hints (broadcast / merge / shuffle_hash / shuffle_replicate_nl,
``src/query3.py:117-126,175-192``), distinct (zip, income), sort
desc/asc, **head(3) to the driver**, second phase re-filters with isin
and joins a 19-row literal dimension, group-count, order desc.

Testdata realization (FIXTURES.md): top/bottom-3 nations by avg customer
account balance; profile = market-segment counts of their lineitems via
customer ⋈ orders ⋈ lineitem, with nation as the broadcast dimension.

Idiomatic fixes over the reference (SURVEY.md §3.3, §4):
- the joined frame is **cached** before the two-phase head/isin pattern,
  so the join pipeline doesn't execute twice;
- the nation dim join is an explicit broadcast (25 rows);
- head(k) is the only driver round-trip and k is bounded (3).

Scale notes: customer⋈orders⋈lineitem are key-partitioned shuffle joins
(sort-merge or shuffled-hash — left to Catalyst/AQE, overridable via
``hints``); AQE skew-join splits oversized partitions. Phase-1 aggregate
(avg per nation, 25 groups) is map-side partial; the driver only ever
receives 3 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

JOIN_HINTS = ("broadcast", "merge", "shuffle_hash", "shuffle_replicate_nl")


def _oracle(top: bool) -> str:
    direction = "DESC" if top else "ASC"
    return f"""
WITH joined AS (
    SELECT n.n_name, c.c_mktsegment, c.c_custkey, c.c_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), nat_bal AS (
    SELECT n_name, AVG(c_acctbal) AS avg_bal
    FROM (SELECT DISTINCT n_name, c_custkey, c_acctbal FROM joined)
    GROUP BY n_name
), topk AS (
    SELECT n_name FROM nat_bal ORDER BY avg_bal {direction}, n_name ASC LIMIT 3
)
SELECT n_name, c_mktsegment, COUNT(*) AS cnt
FROM joined
WHERE n_name IN (SELECT n_name FROM topk)
GROUP BY n_name, c_mktsegment
ORDER BY cnt DESC, n_name ASC, c_mktsegment ASC
"""


def segment_profile(
    spark: SparkSession,
    sf_dir: str,
    top: bool = True,
    hint_orders: str | None = None,
    hint_lineitem: str | None = None,
    cache: bool = True,
) -> DataFrame:
    """Build the two-phase profile query.

    ``hint_orders`` / ``hint_lineitem`` mirror the reference's per-join
    strategy hints (J5, ``src/query3.py:117-126``): one of JOIN_HINTS or
    None for Catalyst's own choice ("optimal" in the reference CLI).
    """
    for h in (hint_orders, hint_lineitem):
        if h is not None and h not in JOIN_HINTS:
            raise ValueError(f"unknown join hint {h!r}; expected one of {JOIN_HINTS}")
    if hint_orders or hint_lineitem:
        # Uncacheable BY CONSTRUCTION under hints: Spark's CacheManager
        # matches cached plans ignoring join hints, so a cached unhinted
        # run would silently serve (and erase) every hinted variant.
        cache = False

    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    nation = read_table(spark, sf_dir, "nation")

    cust = customer.join(
        F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"], "inner"
    ).select("c_custkey", "c_mktsegment", "c_acctbal", "n_name")
    if hint_orders or hint_lineitem:
        # Cache-buster: CacheManager substitutes cached plans matching on
        # the HINT-STRIPPED canonical form, so a prior unhinted cached run
        # would silently serve (and erase) the hinted join. The no-op
        # filter makes the hinted plan canonically distinct at cache-lookup
        # time; the optimizer removes it afterwards, leaving the physical
        # plan untouched.
        cust = cust.where(F.lit(True))

    orders_j = orders.hint(hint_orders) if hint_orders else orders
    lineitem_j = lineitem.hint(hint_lineitem) if hint_lineitem else lineitem

    joined = (
        cust.join(orders_j, cust["c_custkey"] == orders_j["o_custkey"], "inner")
        .join(lineitem_j, F.col("o_orderkey") == lineitem_j["l_orderkey"], "inner")
        .select("n_name", "c_mktsegment", "c_custkey", "c_acctbal")
    )
    if cache:
        # reused by both phases — the reference recomputes instead (§3.3).
        joined = joined.cache()

    nat_bal = (
        joined.select("n_name", "c_custkey", "c_acctbal")
        .distinct()  # A3: dedup before ranking (== src/query3.py:131-133)
        .groupBy("n_name")
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    order_col = F.col("avg_bal").desc() if top else F.col("avg_bal").asc()
    topk_rows = nat_bal.orderBy(order_col, F.col("n_name").asc()).head(3)  # bounded driver round-trip
    topk = [r["n_name"] for r in topk_rows]

    return (
        joined.filter(F.col("n_name").isin(topk))
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("n_name").asc(), F.col("c_mktsegment").asc())
    )


@register("q3_segment_profile_top", oracle=_oracle(top=True))
def q3_segment_profile_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    return segment_profile(spark, sf_dir, top=True)


# driver=False: sort-direction twin of _top (O3); fully oracled in pytest.
@register("q3_segment_profile_bottom", oracle=_oracle(top=False), driver=False)
def q3_segment_profile_bottom(spark: SparkSession, sf_dir: str) -> DataFrame:
    return segment_profile(spark, sf_dir, top=False)
