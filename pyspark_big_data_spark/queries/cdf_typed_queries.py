"""Typed change-data-feed witnesses (operators/cdf.py, the typed mode
of sources/chain_cdf.py) and the column-level MERGE witness
(operators/merge.py update_set / insert_values) — the r12-verdict
next-steps #2 and #3.

Each witness builds a MERGE-maintained chain from the driver's own
orders table, exercises the new surface end-to-end (batch feed /
typed stream / partial-update merge), and emits counts + decimal-exact
sums DuckDB recomputes declaratively, plus structural gates (fold
equality, refusals, restart idempotence, SQL==API parity) that flip
the row red if the machinery misbehaves.

Reference parity note: the reference engine (src/query1-4.py) is
read-only; this is extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.functions.aggregates import dsum
from pyspark_big_data_spark.io import read_table, session_tmpdir
from pyspark_big_data_spark.queries.registry import multiset_equal, register


def _mutating_chain(spark: SparkSession, sf_dir: str, prefix: str) -> tuple[str, int]:
    """v0 = orders (key, price); v1 = MERGE (update %5==0 keys +1000 /
    delete the even ones among them / insert negated %7==3 keys at
    price+500); v2 = update_where (double price of %11==0 keys);
    v3 = delete_where (%13==0 keys). Returns (root, head_version).
    Conditions on POSITIVE keys only where negated inserts exist, so
    Spark/DuckDB negative-modulo agreement is never load-bearing."""
    from pyspark_big_data_spark.operators.merge import (
        delete_where,
        merge_into,
        update_where,
    )
    from pyspark_big_data_spark.operators.versioned import write_version

    root = session_tmpdir(prefix)
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_version(orders, root)
    src = (
        orders.filter(F.col("o_orderkey") % 5 == 0)
        .select(
            "o_orderkey", (F.col("o_totalprice") + 1000.0).alias("o_totalprice")
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 7 == 3).select(
                (-F.col("o_orderkey")).alias("o_orderkey"),
                (F.col("o_totalprice") + 500.0).alias("o_totalprice"),
            )
        )
    )
    merge_into(
        spark,
        root,
        src,
        "o_orderkey",
        when_matched_update=True,
        when_matched_delete="source.o_orderkey % 2 = 0",
        when_not_matched_insert=True,
    )
    update_where(
        spark,
        root,
        {"o_totalprice": "o_totalprice * 2"},
        "o_orderkey > 0 AND o_orderkey % 11 = 0",
    )
    res = delete_where(spark, root, "o_orderkey > 0 AND o_orderkey % 13 = 0")
    return root, res["version"]


# The declarative replay of the whole chain: state CTEs per commit,
# change tallies per commit kind, final rows + decimal-exact sum.
_CHAIN_ORACLE_CTES = """
WITH t0 AS (
    SELECT o_orderkey, o_totalprice FROM orders
), src_u AS (
    SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice
    FROM orders WHERE o_orderkey % 5 = 0
), src_i AS (
    SELECT -o_orderkey AS o_orderkey, o_totalprice + 500.0 AS o_totalprice
    FROM orders WHERE o_orderkey % 7 = 3
), upd1 AS (
    SELECT * FROM src_u WHERE o_orderkey % 2 <> 0
), del1 AS (
    SELECT * FROM src_u WHERE o_orderkey % 2 = 0
), state1 AS (
    SELECT * FROM t0 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src_u)
    UNION ALL SELECT * FROM upd1
    UNION ALL SELECT * FROM src_i
), upd2 AS (
    SELECT o_orderkey FROM state1
    WHERE o_orderkey > 0 AND o_orderkey % 11 = 0
), state2 AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey > 0 AND o_orderkey % 11 = 0
                THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
    FROM state1
), del3 AS (
    SELECT o_orderkey FROM state2
    WHERE o_orderkey > 0 AND o_orderkey % 13 = 0
), state3 AS (
    SELECT * FROM state2
    WHERE NOT (o_orderkey > 0 AND o_orderkey % 13 = 0)
)
"""

_FOLD_ORACLE = (
    _CHAIN_ORACLE_CTES
    + """
SELECT (SELECT COUNT(*) FROM state3) AS n_rows,
       (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
        FROM state3) AS price_sum,
       (SELECT COUNT(*) FROM src_i) AS n_insert,
       (SELECT COUNT(*) FROM del1) + (SELECT COUNT(*) FROM del3) AS n_delete,
       (SELECT COUNT(*) FROM upd1) + (SELECT COUNT(*) FROM upd2)
           AS n_update_pre,
       (SELECT COUNT(*) FROM upd1) + (SELECT COUNT(*) FROM upd2)
           AS n_update_post,
       CAST(1 AS BIGINT) AS fold_gate,
       CAST(1 AS BIGINT) AS refusal_gate
"""
)


@register("cdf_typed_fold_witness", oracle=_FOLD_ORACLE, driver=False)
def cdf_typed_fold_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH typed change feed over a MERGE-maintained chain
    (operators/cdf.py::table_changes_typed): per-type change tallies
    plus the folded end state's (n_rows, decimal price_sum), all
    recomputed declaratively by DuckDB. Gates: ``fold_gate`` = 1 iff
    base ⊎ adds ∖ removes equals the MOR head bit-exactly (multiset
    symmetric difference empty); ``refusal_gate`` = 1 iff the
    adds-only feed refuses the vector-bearing range AND the typed feed
    refuses a range polluted by a post-hoc external vector — the two
    soundness walls that keep wrong feeds loud."""
    from pyspark_big_data_spark.operators.cdf import (
        CHANGE_TYPE_COL,
        fold_changes,
        table_changes_typed,
    )
    from pyspark_big_data_spark.operators.deletes import (
        delete_keys,
        read_version_mor,
    )
    from pyspark_big_data_spark.operators.versioned import (
        read_version,
        table_changes,
    )

    root, head_v = _mutating_chain(spark, sf_dir, "cdf_typed_")
    ch = table_changes_typed(spark, root, 0, head_v).persist()
    try:
        folded = fold_changes(read_version(spark, root, 0), ch)
        head = read_version_mor(spark, root, head_v)
        fold_ok = multiset_equal(folded, head)

        refusals = 0
        try:  # adds-only feed must refuse the vector-bearing range
            table_changes(spark, root, 0, head_v)
        except ValueError:
            refusals += 1
        ext_root = session_tmpdir("cdf_typed_ext_")
        from pyspark_big_data_spark.operators.versioned import (
            append_version,
            write_version,
        )

        small = read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        write_version(small.limit(100), ext_root)
        v1 = append_version(small.limit(10), ext_root)
        delete_keys(
            spark,
            ext_root,
            spark.createDataFrame([(1,)], "o_orderkey long"),
            "o_orderkey",
            version=v1,
        )
        try:  # typed feed must refuse post-hoc external vectors in range
            table_changes_typed(spark, ext_root, 0, v1)
        except ValueError:
            refusals += 1

        counts = {
            r[CHANGE_TYPE_COL]: r["n"]
            for r in ch.groupBy(CHANGE_TYPE_COL)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        return head.agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("o_totalprice", "price_sum"),
        ).select(
            "n_rows",
            "price_sum",
            F.lit(counts.get("insert", 0)).cast("long").alias("n_insert"),
            F.lit(counts.get("delete", 0)).cast("long").alias("n_delete"),
            F.lit(counts.get("update_preimage", 0))
            .cast("long")
            .alias("n_update_pre"),
            F.lit(counts.get("update_postimage", 0))
            .cast("long")
            .alias("n_update_post"),
            F.lit(1 if fold_ok else 0).cast("long").alias("fold_gate"),
            F.lit(1 if refusals == 2 else 0).cast("long").alias("refusal_gate"),
        )
    finally:
        ch.unpersist()


_STREAM_ORACLE = (
    _CHAIN_ORACLE_CTES
    + """
SELECT (SELECT COUNT(*) FROM state3) AS n_rows,
       (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
        FROM state3) AS price_sum,
       (SELECT COUNT(*) FROM src_i) + (SELECT COUNT(*) FROM upd1)
           AS n_insert,
       (SELECT COUNT(*) FROM src_u) + (SELECT COUNT(*) FROM del3)
           AS n_delete,
       (SELECT COUNT(*) FROM upd2) AS n_update_pre,
       (SELECT COUNT(*) FROM upd2) AS n_update_post,
       CAST(1 AS BIGINT) AS fold_gate,
       CAST(1 AS BIGINT) AS restart_gate
"""
)


@register("streaming_cdf_typed_replay_witness", oracle=_STREAM_ORACLE, driver=False)
def streaming_cdf_typed_replay_witness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TYPED streaming change feed over a MERGE-maintained chain
    (sources/chain_cdf.py ``change_types=typed`` — the r12-verdict
    gap: the output of the engine's own merge sink is now streamable
    downstream). Replays the whole mutating chain through the real
    availableNow micro-batch loop; the MERGE commit streams the
    keyless changeset (delta→insert, preimage→delete; each partition
    self-contained on executors), the marked update_where/delete_where
    commits stream exact update/delete typing — DuckDB recomputes
    every tally and the folded end state declaratively. Gates:
    ``fold_gate`` = 1 iff the STREAMED rows fold onto v0 to the MOR
    head bit-exactly; ``restart_gate`` = 1 iff a checkpoint-resumed
    run delivers nothing, and one more delete_where then streams
    exactly its own change rows."""
    from pyspark_big_data_spark.operators.cdf import (
        CHANGE_TYPE_COL,
        fold_changes,
    )
    from pyspark_big_data_spark.operators.deletes import read_version_mor
    from pyspark_big_data_spark.operators.merge import delete_where
    from pyspark_big_data_spark.operators.versioned import read_version
    from pyspark_big_data_spark.sources.chain_cdf import register_chain_cdf

    register_chain_cdf(spark)
    root, head_v = _mutating_chain(spark, sf_dir, "cdf_typed_stream_")
    scratch = session_tmpdir("cdf_typed_stream_io_")
    out1, out2, ckpt = f"{scratch}/out1", f"{scratch}/out2", f"{scratch}/ckpt"

    def _run(out_dir):
        def sink(batch, _bid):
            batch.write.mode("append").parquet(out_dir)

        q = (
            spark.readStream.format("chain_cdf")
            .option("path", root)
            .option("from_version", 0)
            .option("change_types", "typed")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _run(out1)
    streamed = spark.read.parquet(out1)
    n_first = streamed.count()

    folded = fold_changes(
        read_version(spark, root, 0),
        streamed.drop("_commit_version"),
    )
    head = read_version_mor(spark, root, head_v)
    fold_ok = multiset_equal(folded, head)

    # restart: nothing redelivered (no batch fires, so the sink dir is
    # never even created); then one more mutation streams exactly its
    # own typed rows
    _run(out2)
    import os

    nothing_new = not os.path.exists(out2)
    res = delete_where(spark, root, "o_orderkey > 0 AND o_orderkey % 17 = 0")
    _run(out2)
    resumed = spark.read.parquet(out2)
    expect_n = res["n_deleted"]
    restart_ok = (
        nothing_new
        and resumed.count() == expect_n
        and resumed.filter(
            (F.col(CHANGE_TYPE_COL) == "delete")
            & (F.col("_commit_version") == res["version"])
        ).count()
        == expect_n
    )

    counts = {
        r[CHANGE_TYPE_COL]: r["n"]
        for r in streamed.groupBy(CHANGE_TYPE_COL)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return head.agg(
        F.count(F.lit(1)).alias("n_rows"), dsum("o_totalprice", "price_sum")
    ).select(
        "n_rows",
        "price_sum",
        F.lit(counts.get("insert", 0)).cast("long").alias("n_insert"),
        F.lit(counts.get("delete", 0)).cast("long").alias("n_delete"),
        F.lit(counts.get("update_preimage", 0))
        .cast("long")
        .alias("n_update_pre"),
        F.lit(counts.get("update_postimage", 0))
        .cast("long")
        .alias("n_update_post"),
        F.lit(1 if fold_ok else 0).cast("long").alias("fold_gate"),
        F.lit(1 if restart_ok else 0).cast("long").alias("restart_gate"),
    )


_PARTIAL_ORACLE = """
WITH target AS (
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
), src_u AS (
    SELECT o_orderkey, 100.0 AS delta FROM orders WHERE o_orderkey % 4 = 1
), src_i AS (
    SELECT -o_orderkey AS o_orderkey, 7.5 AS delta
    FROM orders WHERE o_orderkey % 9 = 4
), final AS (
    SELECT t.o_orderkey,
           CASE WHEN u.o_orderkey IS NOT NULL
                THEN t.o_totalprice + u.delta ELSE t.o_totalprice
           END AS o_totalprice,
           t.o_orderpriority
    FROM target t LEFT JOIN src_u u ON t.o_orderkey = u.o_orderkey
    UNION ALL
    SELECT o_orderkey, delta AS o_totalprice, NULL AS o_orderpriority
    FROM src_i
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS price_sum,
       (SELECT COUNT(*) FROM src_u) AS n_updated,
       (SELECT COUNT(*) FROM src_i) AS n_inserted,
       (SELECT COUNT(*) FROM final WHERE o_orderpriority IS NULL)
           AS n_null_priority,
       CAST(1 AS BIGINT) AS sql_parity_gate,
       CAST(1 AS BIGINT) AS cdf_pair_gate
FROM final
"""


@register("merge_partial_update_witness", oracle=_PARTIAL_ORACLE, driver=False)
def merge_partial_update_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN-LEVEL MERGE clauses driver-verified (operators/merge.py
    ``update_set`` / ``insert_values`` — the partial-update CDC shape
    the r12 verdict named missing #3): the source carries only the key
    and one delta column; UPDATE SET composes target + expression,
    INSERT (cols) VALUES null-fills the unassigned priority column.
    DuckDB recomputes the merged state declaratively (LEFT JOIN +
    CASE). Gates: ``sql_parity_gate`` = 1 iff the statement form
    (``MERGE ... UPDATE SET c = expr ... INSERT (cols) VALUES``) on a
    twin root produces bit-identical tallies and state;
    ``cdf_pair_gate`` = 1 iff the typed change feed pairs this
    commit's changes as update_pre/postimage + insert using the
    manifest-recorded merge keys."""
    from pyspark_big_data_spark.operators.cdf import (
        CHANGE_TYPE_COL,
        table_changes_typed,
    )
    from pyspark_big_data_spark.operators.deletes import read_version_mor
    from pyspark_big_data_spark.operators.merge import merge_into
    from pyspark_big_data_spark.operators.mutation_sql import run_mutation_sql
    from pyspark_big_data_spark.operators.versioned import write_version

    api_root = session_tmpdir("merge_partial_api_")
    sql_root = session_tmpdir("merge_partial_sql_")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    for r in (api_root, sql_root):
        write_version(orders, r)
    src = (
        orders.filter(F.col("o_orderkey") % 4 == 1)
        .select("o_orderkey", F.lit(100.0).alias("delta"))
        .unionByName(
            orders.filter(F.col("o_orderkey") % 9 == 4).select(
                (-F.col("o_orderkey")).alias("o_orderkey"),
                F.lit(7.5).alias("delta"),
            )
        )
    )
    update_set = {"o_totalprice": "target.o_totalprice + source.delta"}
    insert_values = {
        "o_orderkey": "source.o_orderkey",
        "o_totalprice": "source.delta",
    }
    res = merge_into(
        spark,
        api_root,
        src,
        "o_orderkey",
        update_set=update_set,
        insert_values=insert_values,
    )
    state = read_version_mor(spark, api_root, res["version"])

    src.createOrReplaceTempView("partial_cdc_src")
    res_sql = run_mutation_sql(
        spark,
        """
        MERGE INTO t USING partial_cdc_src ON target.o_orderkey = source.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = target.o_totalprice + source.delta
        WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice)
            VALUES (source.o_orderkey, source.delta)
        """,
        {"t": sql_root},
    )
    sql_state = read_version_mor(spark, sql_root, res_sql["version"])
    sql_ok = (
        all(
            res_sql[k] == res[k]
            for k in ("n_deleted", "n_updated", "n_inserted")
        )
        and multiset_equal(state, sql_state)
    )

    ch = table_changes_typed(spark, api_root, 0, res["version"])
    pair = {
        r[CHANGE_TYPE_COL]: r["n"]
        for r in ch.groupBy(CHANGE_TYPE_COL)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    pair_ok = pair == {
        "update_preimage": res["n_updated"],
        "update_postimage": res["n_updated"],
        "insert": res["n_inserted"],
    }

    return state.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice", "price_sum"),
    ).select(
        "n_rows",
        "price_sum",
        F.lit(res["n_updated"]).cast("long").alias("n_updated"),
        F.lit(res["n_inserted"]).cast("long").alias("n_inserted"),
        F.lit(
            state.filter(F.col("o_orderpriority").isNull()).count()
        )
        .cast("long")
        .alias("n_null_priority"),
        F.lit(1 if sql_ok else 0).cast("long").alias("sql_parity_gate"),
        F.lit(1 if pair_ok else 0).cast("long").alias("cdf_pair_gate"),
    )


_BY_SOURCE_ORACLE = """
WITH target AS (
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
), final AS (
    SELECT o_orderkey, o_totalprice + 100.0 AS o_totalprice, o_orderpriority
    FROM target WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'X-INACTIVE' AS o_orderpriority
    FROM target WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS price_sum,
       (SELECT COUNT(*) FROM target
        WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 = 0) AS n_deleted,
       (SELECT COUNT(*) FROM final) AS n_updated,
       (SELECT COUNT(*) FROM final WHERE o_orderpriority = 'X-INACTIVE')
           AS n_deactivated,
       CAST(1 AS BIGINT) AS sql_parity_gate,
       CAST(1 AS BIGINT) AS cdf_fold_gate
FROM final
"""


@register("merge_by_source_witness", oracle=_BY_SOURCE_ORACLE, driver=False)
def merge_by_source_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHEN NOT MATCHED BY SOURCE clauses driver-verified
    (operators/merge.py — Delta's SCD-deactivation shape, r13): the
    source carries ONLY the still-active keys (%3==0); matched rows
    take a column-level price bump, unmatched target rows either
    DELETE (%5==0) or deactivate via ``not_matched_by_source_set``.
    Every row of the target is classified by exactly one clause, so
    n_updated == |final| by construction. DuckDB recomputes the whole
    partition declaratively. Gates: ``sql_parity_gate`` = the
    statement form (``WHEN NOT MATCHED BY SOURCE ...``) on a twin
    root produces bit-identical tallies and state; ``cdf_fold_gate``
    = the typed change feed serves this commit (update pairing via
    manifest merge keys) and folds onto v0 to the MOR head
    bit-exactly."""
    from pyspark_big_data_spark.operators.cdf import (
        fold_changes,
        table_changes_typed,
    )
    from pyspark_big_data_spark.operators.deletes import read_version_mor
    from pyspark_big_data_spark.operators.merge import merge_into
    from pyspark_big_data_spark.operators.mutation_sql import run_mutation_sql
    from pyspark_big_data_spark.operators.versioned import write_version

    api_root = session_tmpdir("merge_bysrc_api_")
    sql_root = session_tmpdir("merge_bysrc_sql_")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    for r in (api_root, sql_root):
        write_version(orders, r)
    src = orders.filter(F.col("o_orderkey") % 3 == 0).select("o_orderkey")

    res = merge_into(
        spark,
        api_root,
        src,
        "o_orderkey",
        when_matched_update=True,
        update_set={"o_totalprice": "target.o_totalprice + 100.0"},
        when_not_matched_insert=None,
        when_not_matched_by_source_delete="target.o_orderkey % 5 = 0",
        when_not_matched_by_source_update=True,
        not_matched_by_source_set={"o_orderpriority": "'X-INACTIVE'"},
    )
    state = read_version_mor(spark, api_root, res["version"])

    src.createOrReplaceTempView("bysrc_active_keys")
    res_sql = run_mutation_sql(
        spark,
        """
        MERGE INTO t USING bysrc_active_keys ON target.o_orderkey = source.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = target.o_totalprice + 100.0
        WHEN NOT MATCHED BY SOURCE AND target.o_orderkey % 5 = 0 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET o_orderpriority = 'X-INACTIVE'
        """,
        {"t": sql_root},
    )
    sql_state = read_version_mor(spark, sql_root, res_sql["version"])
    sql_ok = (
        all(
            res_sql[k] == res[k]
            for k in ("n_deleted", "n_updated", "n_inserted")
        )
        and multiset_equal(state, sql_state)
    )

    ch = table_changes_typed(spark, api_root, 0, res["version"])
    folded = fold_changes(read_version_mor(spark, api_root, 0), ch)
    fold_ok = multiset_equal(folded, state)

    return state.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice", "price_sum"),
    ).select(
        "n_rows",
        "price_sum",
        F.lit(res["n_deleted"]).cast("long").alias("n_deleted"),
        F.lit(res["n_updated"]).cast("long").alias("n_updated"),
        F.lit(
            state.filter(F.col("o_orderpriority") == "X-INACTIVE").count()
        )
        .cast("long")
        .alias("n_deactivated"),
        F.lit(1 if sql_ok else 0).cast("long").alias("sql_parity_gate"),
        F.lit(1 if fold_ok else 0).cast("long").alias("cdf_fold_gate"),
    )
