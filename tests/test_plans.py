"""Plan-shape assertions: the engine's promise isn't just right answers,
it's right *plans* (SURVEY.md §4). These tests pin the physical-plan
properties that matter at 100 TB: small dims broadcast, filters reach
the parquet scan, hints pass through, hot paths stay in codegen."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.q3_segment_profile import segment_profile
from pyspark_big_data_spark.queries.q4_distance import q4_avg_distance
from pyspark_big_data_spark.testing import assert_plan_contains, assert_plan_lacks, physical_plan


def test_q4_dim_join_is_broadcast(spark, sf_dir):
    df = q4_avg_distance(spark, sf_dir)
    assert_plan_contains(df, "BroadcastHashJoin")
    assert_plan_lacks(df, "SortMergeJoin", "CartesianProduct")


def test_q4_filter_pushed_to_scan(spark, sf_dir):
    plan = physical_plan(q4_avg_distance(spark, sf_dir))
    assert "PushedFilters:" in plan
    assert "GreaterThanOrEqual(c_acctbal" in plan, plan


def test_q4_no_python_workers_in_column_tier(spark, sf_dir):
    # the pure-Column tier must not ship rows to Python
    assert_plan_lacks(q4_avg_distance(spark, sf_dir), "BatchEvalPython", "ArrowEvalPython")


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = read_table(spark, sf_dir, "lineitem").select("l_orderkey").filter(F.col("l_orderkey") > 0)
    plan = physical_plan(df)
    assert "ReadSchema" in plan
    # only the selected column is read, not all 11
    read_schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in read_schema_line and "l_extendedprice" not in read_schema_line


def test_join_hint_passthrough_merge(spark, sf_dir):
    spark.catalog.clearCache()  # cached plans match hint-free subtrees and would mask the hint
    df = segment_profile(spark, sf_dir, top=True, hint_lineitem="merge", cache=False)
    assert_plan_contains(df, "SortMergeJoin")


def test_join_hint_passthrough_shuffle_hash(spark, sf_dir):
    spark.catalog.clearCache()
    df = segment_profile(spark, sf_dir, top=True, hint_lineitem="shuffle_hash", cache=False)
    assert_plan_contains(df, "ShuffledHashJoin")


def test_join_hint_survives_default_cache(spark, sf_dir):
    # hints force cache=False by construction, so even after an unhinted
    # cached run the hinted plan must keep its strategy (the CacheManager
    # matches plans ignoring hints and would otherwise swallow it)
    segment_profile(spark, sf_dir, top=True).count()  # populate the cache
    try:
        df = segment_profile(spark, sf_dir, top=True, hint_lineitem="merge")
        assert_plan_contains(df, "SortMergeJoin")
        assert_plan_lacks(df, "InMemoryTableScan")
    finally:
        spark.catalog.clearCache()


def test_join_hint_validation():
    import pytest

    with pytest.raises(ValueError, match="unknown join hint"):
        segment_profile(None, "unused", hint_orders="nested_loop")


def test_aggregation_is_partial_then_final(spark, sf_dir):
    # Catalyst must generate map-side partial aggregation (A1 scale path)
    df = read_table(spark, sf_dir, "lineitem").groupBy("l_returnflag").count()
    plan = physical_plan(df)
    assert plan.count("HashAggregate") >= 2, plan


def test_whole_stage_codegen_active(spark, sf_dir):
    # AQE defers physical planning, so codegen subtrees only materialize in
    # the final plan; disable AQE just to make the codegen spans inspectable.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = read_table(spark, sf_dir, "lineitem").groupBy("l_returnflag").count()
        plan = physical_plan(df, mode="codegen")
        assert "WholeStageCodegen" in plan and "Found 0" not in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_runtime_bloom_filter_injected_for_selective_shuffle_join(spark, sf_dir):
    """The 100 TB semi-join-reduction story: at engine defaults the
    selective dim side broadcasts (no filter needed); when the build
    side exceeds the broadcast threshold, Catalyst injects a runtime
    bloom filter (might_contain) on the fact scan so the shuffle only
    carries candidate keys. Both behaviors pinned."""
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.testing import physical_plan

    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    sel = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    j = l.join(sel, l["l_orderkey"] == sel["o_orderkey"]).groupBy().count()

    # (a) defaults: broadcast, no bloom filter
    assert "BroadcastHashJoin" in physical_plan(j)

    # (b) forced shuffle join: bloom filter appears
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ),
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        j2 = l.join(sel, l["l_orderkey"] == sel["o_orderkey"]).groupBy().count()
        plan = physical_plan(j2)
        assert "might_contain" in plan, "runtime bloom filter not injected"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """The 100 TB partition-elimination story beyond STATIC pruning
    (test_partitioned_write_prunes), pinned in both flavors:

    (a) when the dim-side filter is ON the join key, Catalyst constraint
        propagation infers a STATIC partition filter on the fact scan —
        no runtime subquery needed at all;
    (b) when the filter is on a dim attribute NOT derivable from the
        join key (the TPC-DS date-dim shape), Catalyst must inject a
        dynamicpruning subquery on the fact scan so only the partitions
        surviving the dim filter are read. On a date-partitioned 100 TB
        fact this is the difference between scanning 3 partitions and
        3000."""
    from pyspark.sql import functions as F

    fact_dir = str(tmp_path / "orders_by_priority")
    o = read_table(spark, sf_dir, "orders")
    o.write.partitionBy("o_orderpriority").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)

    # (a) filter on the join key itself -> static inference, no DPP
    dim_keyed = (
        o.select("o_orderpriority")
        .distinct()
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .withColumnRenamed("o_orderpriority", "p")
    )
    j_static = fact.join(dim_keyed, fact["o_orderpriority"] == dim_keyed["p"]).groupBy().count()
    plan_static = physical_plan(j_static)
    assert "PartitionFilters: [(o_orderpriority" in plan_static.replace("isnotnull(o_orderpriority", "").replace(
        "dynamicpruning", ""
    ) or "= 1-URGENT" in plan_static, plan_static

    # (b) filter on a literal dim attribute -> runtime DPP subquery
    prios = sorted(r[0] for r in o.select("o_orderpriority").distinct().collect())
    dim = spark.createDataFrame(
        [(p, "hot" if p[0] in "12" else "cold") for p in prios], "p string, tier string"
    )
    joined = (
        fact.join(dim, fact["o_orderpriority"] == dim["p"])
        .filter(F.col("tier") == "hot")
        .groupBy()
        .count()
    )
    plan = physical_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan
    # and the result is right: only the 'hot' partitions contributed
    hot = [p for p in prios if p[0] in "12"]
    expected = o.filter(F.col("o_orderpriority").isin(hot)).count()
    assert joined.collect()[0][0] == expected


def test_latest_order_maxby_has_no_window_sort(spark, sf_dir):
    """Top-1-per-group via max(struct) must plan as a partial+final
    aggregate — no Window operator, no per-partition Sort of the fact
    table (the whole point vs row_number)."""
    from pyspark_big_data_spark.queries.analytics import latest_order_per_customer

    df = latest_order_per_customer(spark, sf_dir)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert plan.count("HashAggregate") >= 2 or "SortAggregate" in plan, plan


def test_weighted_sample_is_take_ordered(spark, sf_dir):
    """orderBy+limit must plan as TakeOrderedAndProject (per-partition
    partial top-k, single k-row exchange) — never a global Sort."""
    from pyspark_big_data_spark.queries.text_analysis import weighted_sample_quality

    plan = physical_plan(weighted_sample_quality(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_q7_two_branch_topology_broadcasts_dims(spark, sf_dir):
    """Both nation branches must attach by broadcast (no fact shuffle
    for the dims); the cross-branch <> predicate is a residual filter,
    never a join explosion."""
    from pyspark_big_data_spark.queries.analytics import nation_volume_shipping

    df = nation_volume_shipping(spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_aqe_splits_skewed_join_partition(spark):
    """The 100 TB hot-key story WITHOUT manual salting: AQE's
    OptimizeSkewedJoin must detect the oversized shuffle partition at
    runtime and split it (SortMergeJoin(skew=true) + AQEShuffleRead
    skewed in the executed plan). operators/joins.py::salted_join is
    the manual fallback; this pins that the automatic path engages."""
    from pyspark.sql import functions as F

    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        # 90% of left rows share one key -> one hot shuffle partition
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 100).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
        )
        j = left.join(right, "k").groupBy().count()
        assert j.collect()[0][0] == 400_000  # inner join keeps every left row
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead skewed" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_correlated_subquery_is_decorrelated(spark, sf_dir):
    """The correlated scalar subquery must rewrite to aggregate+join —
    no per-outer-row subquery execution nodes in the physical plan."""
    from pyspark_big_data_spark.queries.analytics import orders_above_customer_avg

    plan = physical_plan(orders_above_customer_avg(spark, sf_dir))
    assert "Subquery" not in plan, plan
    assert "HashAggregate" in plan and "Join" in plan, plan


def test_max_partition_bytes_controls_scan_parallelism(spark):
    """spark.sql.files.maxPartitionBytes is the scan-sizing knob the
    100 TB notes lean on: shrinking it must split the same file into
    more input partitions (smaller per-task memory footprint), growing
    it must coalesce. Pinned against the sf0.1 lineitem file."""
    path = "/root/testdata/sf0.1/lineitem.parquet"
    saved = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
        small = spark.read.parquet(path).rdd.getNumPartitions()
        spark.conf.set("spark.sql.files.maxPartitionBytes", "512m")
        big = spark.read.parquet(path).rdd.getNumPartitions()
        assert small > big >= 1, (small, big)
        assert small >= 8, small  # ~19MB file at 1m splits -> many tasks
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", saved)


def test_ab_readout_is_pure_aggregate_plan(spark, sf_dir):
    """The A/B readout must stay a two-level aggregate: no window, no
    join — a regression here (e.g. a windowed rewrite) would turn a
    single-row readout into a corpus-wide sort."""
    from pyspark_big_data_spark.queries.statistics import ab_test_readout

    df = ab_test_readout(spark, sf_dir)
    assert_plan_lacks(df, "Window", "Join")
    assert_plan_contains(df, "HashAggregate")


def test_erasure_audit_joins_all_broadcast(spark, sf_dir):
    """Every cascade leg probes a broadcast key set — a SortMergeJoin
    appearing here means a corpus-sized shuffle snuck into what must
    stay map-side semi/anti probes."""
    from pyspark_big_data_spark.queries.quality import user_erasure_audit

    df = user_erasure_audit(spark, sf_dir)
    assert_plan_lacks(df, "SortMergeJoin", "ShuffledHashJoin")
    assert_plan_contains(df, "BroadcastHashJoin")


def test_ohlc_is_aggregate_only_no_window(spark, sf_dir):
    """OHLC bars must come from struct-extrema aggregates (shuffles
    ~n_bars rows), never a per-tick row_number window — the window
    formulation is the ORACLE's job, not the engine's plan."""
    from pyspark_big_data_spark.queries.event_windows import ohlc_purchase_hourly

    plan = physical_plan(ohlc_purchase_hourly(spark, sf_dir))
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan
