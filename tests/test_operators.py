"""Operator-level tests: IO round-trips, partition pruning, salted join
equivalence, approximate distinct accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_big_data_spark.io import csv_to_parquet, read_csv, read_table, write_parquet
from pyspark_big_data_spark.operators.joins import broadcast_join, salted_join
from pyspark_big_data_spark.testing import physical_plan


def test_csv_to_parquet_roundtrip(spark, sf_dir, tmp_path):
    nation = read_table(spark, sf_dir, "nation")
    csv_path = str(tmp_path / "nation_csv")
    nation.write.option("header", True).csv(csv_path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    pq_path = str(tmp_path / "nation_pq")
    csv_to_parquet(spark, csv_path, pq_path, schema)
    back = spark.read.parquet(pq_path)
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in nation.collect()
    )
    # explicit schema, not inference
    assert read_csv(spark, csv_path, schema).schema == schema


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = read_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    write_parquet(orders, path, partition_by=["o_year"])
    df = spark.read.parquet(path).filter(F.col("o_year") == 1996)
    plan = physical_plan(df)
    assert "PartitionFilters: [isnotnull(o_year" in plan.replace("#", " #").replace(
        "o_year #", "o_year#"
    ) or "o_year" in plan.split("PartitionFilters")[1].splitlines()[0]
    # pruned scan must read fewer files than the full table
    full = spark.read.parquet(path)
    assert df.count() < full.count()
    assert df.count() == orders.filter(F.col("o_year") == 1996).count()


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    okey = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(okey, "l_orderkey").groupBy("o_orderpriority").count()
    salted = (
        salted_join(li, okey, "l_orderkey", num_salts=4)
        .groupBy("o_orderpriority")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_broadcast_join_plan(spark, sf_dir):
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    df = broadcast_join(cust, nation, cust["c_nationkey"] == nation["n_nationkey"])
    assert "BroadcastHashJoin" in physical_plan(df)


def test_percentile_approx_close_to_exact(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    row = orders.select(
        F.expr("percentile(o_totalprice, 0.9)").alias("exact"),
        F.percentile_approx("o_totalprice", 0.9, 10000).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.02


def test_approx_count_distinct_close(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    exact = ev.select(F.count_distinct("user_id").alias("n")).first()["n"]
    approx = ev.select(F.approx_count_distinct("user_id").alias("n")).first()["n"]
    assert abs(approx - exact) / exact < 0.05


def test_hll_sketch_accuracy_and_merge(spark, sf_dir):
    """Datasketches HLL: estimate close to exact, and partial sketches
    built per source partition union to the same estimate as a direct
    sketch — the mergeability that makes sketches the 100 TB path."""
    ev = read_table(spark, sf_dir, "events")
    exact = ev.select(F.count_distinct("user_id").alias("n")).first()["n"]
    direct = ev.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n")
    ).first()["n"]
    assert abs(direct - exact) / exact < 0.05

    # build partials per event_type, then merge: same estimate as direct
    partials = ev.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = partials.select(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n")
    ).first()["n"]
    assert merged == direct


def test_allpairs_guard_refuses_big_inputs(spark):
    from pyspark_big_data_spark.queries.similarity import ALLPAIRS_MAX_ROWS, guard_allpairs
    import pytest

    small = spark.range(10).withColumnRenamed("id", "vec_id")
    assert guard_allpairs(small, "test") is small  # passthrough under the limit

    big = spark.range(ALLPAIRS_MAX_ROWS + 1)
    with pytest.raises(ValueError, match="refusing all-pairs"):
        guard_allpairs(big, "test")


def test_connected_components_raises_on_non_convergence(spark):
    from pyspark_big_data_spark.operators.graph import connected_components
    import pytest

    # a 12-node chain has diameter 11 > max_iterations=2: must raise, not
    # silently return half-propagated labels
    nodes = spark.range(12).withColumnRenamed("id", "node")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, node_col="node", max_iterations=2)
    # and converges fine with enough iterations
    ok = connected_components(nodes, edges, node_col="node", max_iterations=15)
    assert {r["component"] for r in ok.collect()} == {0}


def test_star_contraction_handles_long_chains_in_log_rounds(spark):
    """connected_components_star is diameter-independent: a 200-node
    chain (diameter 199, where propagation needs 199 iterations)
    resolves within the default 30 star rounds."""
    from pyspark_big_data_spark.operators.graph import connected_components_star

    nodes = spark.range(200).withColumnRenamed("id", "node")
    edges = spark.createDataFrame([(i, i + 1) for i in range(199)], ["id_a", "id_b"])
    got = connected_components_star(nodes, edges, node_col="node")
    assert {r["component"] for r in got.collect()} == {0}
    assert got.count() == 200


def test_star_contraction_equals_propagation(spark):
    """Both algorithms must agree on a mixed graph: several clusters of
    different shapes plus singletons."""
    from pyspark_big_data_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )
    import random

    rng = random.Random(7)
    # 3 random clusters over disjoint id ranges + 10 singleton nodes
    edges = []
    for base in (0, 100, 200):
        ids = list(range(base, base + 30))
        for _ in range(40):
            edges.append((rng.choice(ids), rng.choice(ids)))
    nodes = spark.createDataFrame(
        [(i,) for i in range(0, 30)]
        + [(i,) for i in range(100, 130)]
        + [(i,) for i in range(200, 230)]
        + [(i,) for i in range(900, 910)],
        ["node"],
    )
    e = spark.createDataFrame(edges, ["id_a", "id_b"])
    a = {(r["id"], r["component"]) for r in connected_components(nodes, e, node_col="node").collect()}
    b = {(r["id"], r["component"]) for r in connected_components_star(nodes, e, node_col="node").collect()}
    assert a == b


def test_merge_components_incremental_hand_graph(spark):
    """The merge must handle every shape in one batch: a new doc
    BRIDGING two existing clusters (their min ids must merge), a new
    doc joining one cluster, a new-new pair forming a fresh cluster,
    and a singleton new doc — while untouched clusters keep their
    labels."""
    from pyspark_big_data_spark.operators.graph import merge_components_incremental

    # old map: cluster {1,2} (root 1), cluster {5,6} (root 5),
    # untouched cluster {8,9} (root 8)
    cmap = spark.createDataFrame(
        [(1, 1), (2, 1), (5, 5), (6, 5), (8, 8), (9, 8)], ["id", "component"]
    )
    new_nodes = spark.createDataFrame([(10,), (11,), (12,), (13,), (14,)], ["id"])
    # 10 bridges clusters 1 and 5 (via members 2 and 6); 11-12 form a
    # new pair; 13 joins cluster 8 via 9; 14 is a singleton
    edges = spark.createDataFrame([(2, 10), (10, 6), (11, 12), (9, 13)], ["id_a", "id_b"])

    got = {
        (r["id"], r["component"])
        for r in merge_components_incremental(cmap, new_nodes, edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (5, 1), (6, 1), (10, 1),  # merged bridge cluster
        (8, 8), (9, 8), (13, 8),                   # grown cluster
        (11, 11), (12, 11),                        # fresh new-new cluster
        (14, 14),                                  # singleton
    }


def test_cluster_map_loop_equals_full_recompute(spark, sf_dir, tmp_path):
    """Operational loop contract: replaying the corpus in 3 micro-batches
    through process_document_batch + update_cluster_map yields EXACTLY
    the full-recompute cluster map (same labels, same clusters) — the
    continuous version of dedup_clusters_incremental's oracle."""
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.queries.dedup import dedup_clusters
    from pyspark_big_data_spark.streaming.incremental_dedup import (
        process_document_batch,
        update_cluster_map,
    )

    docs = read_table(spark, sf_dir, "documents")
    index_dir = str(tmp_path / "index")
    map_dir = str(tmp_path / "cmap")

    for shard in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == shard)
        new_pairs = process_document_batch(batch, index_dir)
        update_cluster_map(batch.select("doc_id"), new_pairs, map_dir)

    got = {
        (r["id"], r["component"]) for r in spark.read.parquet(map_dir).collect()
    }
    want = {
        (r["doc_id"], r["cluster_id"]) for r in dedup_clusters(spark, sf_dir).collect()
    }
    assert got == want


def test_incremental_dedup_equals_full_recompute(spark, sf_dir, tmp_path):
    """old-corpus pairs ∪ incremental pairs must equal the full-recompute
    pair set exactly (and be disjoint): the incremental path finds every
    pair touching the new batch and never re-emits a corpus-only pair.
    Also exercises real index reuse: the second call consumes the index
    built by the first without rebuilding."""
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.operators import dedup as DD
    from pyspark_big_data_spark.queries.dedup import (
        _EST_THRESHOLD,
        _INCR_MOD,
        build_minhash_index,
        dedup_minhash_incremental,
        dedup_minhash_lsh,
    )

    def pairs(df):
        return {(r["id_a"], r["id_b"]) for r in df.collect()}

    full = pairs(dedup_minhash_lsh(spark, sf_dir))

    corpus = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % _INCR_MOD != 0)
    sigs = DD.minhash_signatures(DD.shingles(corpus)).cache()
    old = pairs(
        DD.estimated_jaccard(DD.candidate_pairs(DD.band_keys(sigs)), sigs).filter(
            F.col("est_jaccard") >= _EST_THRESHOLD
        )
    )

    index_dir = str(tmp_path / "minhash_index")
    build_minhash_index(corpus, index_dir)
    incr = pairs(dedup_minhash_incremental(spark, sf_dir, index_dir=index_dir))

    assert old | incr == full
    assert old & incr == set()


def test_hll_overlap_inclusion_exclusion_accuracy(spark, sf_dir):
    """The sketch overlap must sit inside the compounded HLL error
    envelope around the exact intersection (3 estimates at ~2% relative
    standard error each -> allow 10% + small absolute slack)."""
    from pyspark_big_data_spark.queries.cleaning import (
        user_overlap_exact,
        user_overlap_sketch,
    )

    exact = user_overlap_exact(spark, sf_dir).collect()[0][0]
    est = user_overlap_sketch(spark, sf_dir).collect()[0][0]
    assert exact > 0
    assert abs(est - exact) <= max(3, 0.10 * exact)


def test_multi_touch_credits_conserve_value(spark, sf_dir):
    """Per purchase, the linear-by-recency credits must sum back to the
    purchase value (the reconciliation law): sum over ranks of
    v*r*2/(n(n+1)) == v exactly up to the 9dp per-credit rounding."""
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.queries.event_windows import multi_touch_attribution

    mta = multi_touch_attribution(spark, sf_dir)
    per_purchase = (
        mta.groupBy("purchase_id")
        .agg(F.sum("credit").alias("total_credit"), F.max("n_touches").alias("n"))
    )
    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("purchase_id"), "value"
    )
    joined = per_purchase.join(ev, "purchase_id").collect()
    assert joined, "no attributed purchases in fixture"
    for r in joined:
        # each of n credits rounds at 9dp -> worst-case n * 5e-10 drift
        assert abs(r["total_credit"] - r["value"]) <= r["n"] * 5e-10 + 1e-12, r
