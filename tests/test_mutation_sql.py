"""SQL-text front for the mutation layer
(operators/mutation_sql.py): every statement form asserted EQUAL to
its Python-API twin on identical inputs — the two surfaces cannot
drift (the reference's SQL-co-equal principle, src/query1.py:94-115,
extended to the extension surface)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyspark_big_data_spark.operators.deletes import read_version_mor
from pyspark_big_data_spark.operators.merge import merge_into
from pyspark_big_data_spark.operators.mutation_sql import run_mutation_sql
from pyspark_big_data_spark.operators.versioned import (
    latest_version,
    read_version,
    write_version,
)


def _df(spark, lo, hi, mark=0.0):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2.0 + mark).alias("x")
    )


def _rows(df):
    return sorted((r["k"], r["x"]) for r in df.collect())


def test_merge_statement_equals_api(spark, tmp_path):
    api_root = str(tmp_path / "api")
    sql_root = str(tmp_path / "sql")
    for r in (api_root, sql_root):
        write_version(_df(spark, 0, 100), r)
    src = _df(spark, 90, 110, mark=1.0).withColumn(
        "is_del", (F.col("k") % 2 == 0) & (F.col("k") < 100)
    )
    src.createOrReplaceTempView("cdc_batch")

    api = merge_into(
        spark,
        api_root,
        src,
        "k",
        when_matched_update="NOT source.is_del",
        when_matched_delete="source.is_del",
        when_not_matched_insert="NOT source.is_del",
    )
    got = run_mutation_sql(
        spark,
        """
        MERGE INTO t USING cdc_batch ON target.k = source.k
        WHEN MATCHED AND source.is_del THEN DELETE
        WHEN MATCHED AND NOT source.is_del THEN UPDATE SET *
        WHEN NOT MATCHED AND NOT source.is_del THEN INSERT *
        """,
        {"t": sql_root},
    )
    assert {k: got[k] for k in ("n_deleted", "n_updated", "n_inserted")} == {
        k: api[k] for k in ("n_deleted", "n_updated", "n_inserted")
    }
    assert _rows(read_version_mor(spark, sql_root)) == _rows(
        read_version_mor(spark, api_root)
    )


def test_time_travel_select_statements(spark, tmp_path):
    from pyspark_big_data_spark.operators.versioned import (
        read_version_as_of,
        version_commit_times,
    )

    root = str(tmp_path / "vds")
    write_version(_df(spark, 0, 10), root)
    write_version(_df(spark, 0, 30), root)

    got = run_mutation_sql(
        spark,
        "SELECT COUNT(*) AS n FROM t VERSION AS OF 0",
        {"t": root},
    )
    assert got.collect()[0]["n"] == read_version(spark, root, 0).count() == 10

    import datetime as _dt

    ts = _dt.datetime.fromtimestamp(
        version_commit_times(spark, root)[0]
    ).isoformat()
    got2 = run_mutation_sql(
        spark,
        f"SELECT SUM(x) AS s FROM t TIMESTAMP AS OF '{ts}'",
        {"t": root},
    )
    want = read_version_as_of(spark, root, ts).agg(F.sum("x").alias("s"))
    assert got2.collect()[0]["s"] == want.collect()[0]["s"]


def test_restore_branch_tag_statements(spark, tmp_path):
    from pyspark_big_data_spark.operators.refs import (
        branch_head,
        list_branches,
        read_tag,
    )

    root = str(tmp_path / "vds")
    write_version(_df(spark, 0, 10), root)
    write_version(_df(spark, 0, 30), root)

    v = run_mutation_sql(
        spark, "RESTORE TABLE t TO VERSION AS OF 0", {"t": root}
    )
    assert v == latest_version(spark, root)
    assert read_version(spark, root, v).count() == 10

    run_mutation_sql(spark, "CREATE BRANCH main ON t AT VERSION 0", {"t": root})
    run_mutation_sql(spark, "CREATE BRANCH dev ON t AT VERSION 0", {"t": root})
    assert set(list_branches(spark, root)) == {"main", "dev"}

    from pyspark_big_data_spark.operators.refs import commit_to_branch

    commit_to_branch(_df(spark, 100, 105), root, "dev", append=True)
    res = run_mutation_sql(
        spark, "MERGE BRANCH dev INTO main ON t", {"t": root}
    )
    assert res["mode"] == "fast-forward"
    assert branch_head(spark, root, "main") == branch_head(spark, root, "dev")

    run_mutation_sql(
        spark, "CREATE TAG rel ON t AT VERSION 0 NOTE 'first cut'", {"t": root}
    )
    assert read_tag(spark, root, "rel") == 0


def test_branch_tag_reads_and_keyed_merge_statements(spark, tmp_path):
    from pyspark_big_data_spark.operators.merge import merge_to_branch
    from pyspark_big_data_spark.operators.refs import read_branch

    root = str(tmp_path / "vds")
    write_version(_df(spark, 0, 20), root)
    cat = {"t": root}
    run_mutation_sql(spark, "CREATE BRANCH main ON t AT VERSION 0", cat)
    run_mutation_sql(spark, "CREATE BRANCH dev ON t AT VERSION 0", cat)
    run_mutation_sql(spark, "CREATE TAG rel ON t AT VERSION 0", cat)

    # divergent MERGEs on both branches -> append-level refuses, the
    # BY KEY statement resolves (disjoint keys)
    merge_to_branch(
        spark, root, "dev",
        spark.createDataFrame([(1, 111.0)], "k long, x double"), "k",
    )
    merge_to_branch(
        spark, root, "main",
        spark.createDataFrame([(5, 555.0)], "k long, x double"), "k",
    )
    with pytest.raises(ValueError):
        run_mutation_sql(spark, "MERGE BRANCH dev INTO main ON t", cat)
    res = run_mutation_sql(spark, "MERGE BRANCH dev INTO main ON t BY KEY k", cat)
    assert res["mode"] == "keyed-merge"

    got = run_mutation_sql(
        spark, "SELECT COUNT(*) AS n FROM t BRANCH main", cat
    ).collect()[0]["n"]
    # branch head is a MERGE commit: the statement surface must read it
    # MERGE-ON-READ (retired copies masked), exactly like the API
    from pyspark_big_data_spark.operators.refs import branch_head

    head = branch_head(spark, root, "main")
    assert got == read_version_mor(spark, root, head).count() == 20
    assert read_version(spark, root, head).count() > 20  # physical > logical

    tag_n = run_mutation_sql(
        spark, "SELECT COUNT(*) AS n FROM t TAG rel", cat
    ).collect()[0]["n"]
    assert tag_n == 20

    # RESTORE TO TIMESTAMP parity with the API resolver
    from pyspark_big_data_spark.operators.versioned import (
        latest_version,
        version_commit_times,
    )
    import datetime as _dt

    ts = _dt.datetime.fromtimestamp(
        version_commit_times(spark, root)[0]
    ).isoformat()
    v = run_mutation_sql(
        spark, f"RESTORE TABLE t TO TIMESTAMP AS OF '{ts}'", cat
    )
    assert v == latest_version(spark, root)


def test_travel_select_is_merge_on_read(spark, tmp_path):
    """A MERGE-bearing chain read through the statement surface serves
    the LOGICAL state: retired target copies are masked, exactly like
    read_version_mor — never the physical files (which would double
    updated rows and resurrect deleted ones)."""
    root = str(tmp_path / "vds")
    write_version(_df(spark, 0, 50), root)
    src = _df(spark, 40, 60, mark=1.0)
    res = merge_into(spark, root, src, "k")
    got = run_mutation_sql(
        spark,
        f"SELECT COUNT(*) AS n FROM t VERSION AS OF {res['version']}",
        {"t": root},
    ).collect()[0]["n"]
    assert got == 60  # 50 - 10 updated-in-place + 20 upserts = 60 logical
    assert read_version(spark, root, res["version"]).count() == 70  # physical


def test_literals_are_lexically_inert(spark, tmp_path):
    """'--' inside a string is not a comment; travel-shaped text inside
    a string is not rewritten."""
    root = str(tmp_path / "vds")
    write_version(
        _df(spark, 0, 10).withColumn("note", F.lit("see t VERSION AS OF 2")),
        root,
    )
    got = run_mutation_sql(
        spark,
        "SELECT COUNT(*) AS n FROM t VERSION AS OF 0 "
        "WHERE note = 'see t VERSION AS OF 2'",
        {"t": root},
    ).collect()[0]["n"]
    assert got == 10

    from pyspark_big_data_spark.operators.refs import read_tag

    run_mutation_sql(
        spark, "CREATE TAG x ON t AT VERSION 0 NOTE 'pre--launch'", {"t": root}
    )
    assert read_tag(spark, root, "x") == 0


def test_update_before_delete_order_is_refused(spark, tmp_path):
    """The engine's clause order is delete-first (Delta's rule); a
    statement whose textual order implies SQL first-match-wins UPDATE
    priority is refused instead of silently diverging."""
    root = str(tmp_path / "vds")
    write_version(_df(spark, 0, 10), root)
    _df(spark, 0, 5).withColumn(
        "is_del", F.col("k") % 2 == 0
    ).createOrReplaceTempView("ordsrc")
    with pytest.raises(ValueError, match="DELETE first"):
        run_mutation_sql(
            spark,
            "MERGE INTO t USING ordsrc ON target.k = source.k "
            "WHEN MATCHED AND NOT source.is_del THEN UPDATE SET * "
            "WHEN MATCHED AND source.is_del THEN DELETE",
            {"t": root},
        )


def test_subset_refusals_are_loud(spark, tmp_path):
    root = str(tmp_path / "vds")
    write_version(_df(spark, 0, 5), root)
    _df(spark, 0, 3).createOrReplaceTempView("srcv")
    cat = {"t": root}
    with pytest.raises(ValueError, match="documented mutation-SQL subset"):
        run_mutation_sql(spark, "DROP TABLE t", cat)
    with pytest.raises(ValueError, match="equi-conditions"):
        run_mutation_sql(
            spark,
            "MERGE INTO t USING srcv ON target.k > source.k "
            "WHEN MATCHED THEN UPDATE SET *",
            cat,
        )
    with pytest.raises(ValueError, match="unknown table"):
        run_mutation_sql(
            spark,
            "MERGE INTO nope USING srcv ON target.k = source.k "
            "WHEN MATCHED THEN UPDATE SET *",
            cat,
        )
    # r13: column-level SET parses; assigning a non-existent column is
    # refused by merge_into's validation instead of the parser
    with pytest.raises(ValueError, match="non-existent"):
        run_mutation_sql(
            spark,
            "MERGE INTO t USING srcv ON target.k = source.k "
            "WHEN MATCHED THEN UPDATE SET nope = 1",
            cat,
        )
    with pytest.raises(ValueError, match="unsupported MERGE clause"):
        run_mutation_sql(
            spark,
            "MERGE INTO t USING srcv ON target.k = source.k "
            "WHEN MATCHED THEN UPSERT",
            cat,
        )


def test_commit_transaction_statement(spark, tmp_path):
    """COMMIT TRANSACTION == commit_txn: multi-table atomic publish
    through the statement form, with APPEND and EXPECTED pins."""
    from pyspark_big_data_spark.operators.multitxn import (
        TxnConflict,
        read_txn_table,
        txn_manifest,
    )

    g = str(tmp_path / "grp")
    cat = {"g": g}
    _df(spark, 0, 10).createOrReplaceTempView("txn_orders")
    _df(spark, 0, 20).createOrReplaceTempView("txn_items")
    t0 = run_mutation_sql(
        spark,
        "COMMIT TRANSACTION ON g WRITE orders FROM txn_orders, "
        "items FROM txn_items",
        cat,
    )
    assert t0 == 0
    assert set(txn_manifest(spark, g)["tables"]) == {"orders", "items"}
    assert read_txn_table(spark, g, "items").count() == 20

    _df(spark, 10, 15).createOrReplaceTempView("txn_orders2")
    t1 = run_mutation_sql(
        spark,
        "COMMIT TRANSACTION ON g WRITE orders FROM txn_orders2 APPEND EXPECTED 0",
        cat,
    )
    assert t1 == 1
    assert read_txn_table(spark, g, "orders").count() == 15
    assert read_txn_table(spark, g, "items").count() == 20  # pin carried

    with pytest.raises(TxnConflict, match="moved"):
        run_mutation_sql(
            spark,
            "COMMIT TRANSACTION ON g WRITE orders FROM txn_orders EXPECTED 0",
            cat,
        )


# ---------------------------------------------------------------------------
# r13 statements: DELETE FROM / UPDATE ... SET and column-level MERGE.
# ---------------------------------------------------------------------------


def _catalog_table(spark, tmp_path, name="t"):
    root = str(tmp_path / name)
    write_version(
        spark.createDataFrame(
            [(i, f"u{i}", float(i * 10), i % 3) for i in range(10)],
            "k int, name string, val double, seg int",
        ),
        root,
    )
    return root, {name: root}


def test_delete_from_statement_matches_api(spark, tmp_path):
    from pyspark_big_data_spark.operators.deletes import read_version_mor
    from pyspark_big_data_spark.operators.merge import delete_where

    root, cat = _catalog_table(spark, tmp_path)
    root2, _ = _catalog_table(spark, tmp_path, "t2")
    res = run_mutation_sql(spark, "DELETE FROM t WHERE k >= 7", cat)
    want = delete_where(spark, root2, "k >= 7")
    assert res["n_deleted"] == want["n_deleted"] == 3
    a = read_version_mor(spark, root)
    b = read_version_mor(spark, root2)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_update_statement_matches_api(spark, tmp_path):
    from pyspark_big_data_spark.operators.deletes import read_version_mor
    from pyspark_big_data_spark.operators.merge import update_where

    root, cat = _catalog_table(spark, tmp_path)
    root2, _ = _catalog_table(spark, tmp_path, "t2")
    res = run_mutation_sql(
        spark, "UPDATE t SET val = val * 2, name = upper(name) WHERE seg = 0", cat
    )
    want = update_where(
        spark, root2, {"val": "val * 2", "name": "upper(name)"}, "seg = 0"
    )
    assert res["n_updated"] == want["n_updated"] == 4
    a = read_version_mor(spark, root)
    b = read_version_mor(spark, root2)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_update_statement_without_where_hits_all_rows(spark, tmp_path):
    from pyspark_big_data_spark.operators.deletes import read_version_mor

    _, cat = _catalog_table(spark, tmp_path)
    res = run_mutation_sql(spark, "UPDATE t SET val = 0", cat)
    assert res["n_updated"] == 10
    got = read_version_mor(spark, cat["t"])
    assert got.filter("val <> 0").count() == 0


def test_update_statement_where_inside_literal_not_split(spark, tmp_path):
    from pyspark_big_data_spark.operators.deletes import read_version_mor

    _, cat = _catalog_table(spark, tmp_path)
    res = run_mutation_sql(
        spark, "UPDATE t SET name = ' where ' WHERE k = 1", cat
    )
    assert res["n_updated"] == 1
    got = read_version_mor(spark, cat["t"]).filter("k = 1").collect()
    assert got[0]["name"] == " where "


def test_merge_statement_column_level_clauses(spark, tmp_path):
    from pyspark_big_data_spark.operators.deletes import read_version_mor
    from pyspark_big_data_spark.operators.merge import merge_into

    root, cat = _catalog_table(spark, tmp_path)
    root2, _ = _catalog_table(spark, tmp_path, "t2")
    src = spark.createDataFrame(
        [(2, 5.0), (4, 7.0), (99, 1.5)], "k int, delta double"
    )
    src.createOrReplaceTempView("cdc_partial_src")
    res = run_mutation_sql(
        spark,
        """
        MERGE INTO t USING cdc_partial_src ON target.k = source.k
        WHEN MATCHED THEN UPDATE SET val = target.val + source.delta
        WHEN NOT MATCHED THEN INSERT (k, val, name)
            VALUES (source.k, source.delta, 'new')
        """,
        cat,
    )
    want = merge_into(
        spark,
        root2,
        src,
        "k",
        update_set={"val": "target.val + source.delta"},
        insert_values={"k": "source.k", "val": "source.delta", "name": "'new'"},
    )
    assert {k: res[k] for k in ("n_deleted", "n_updated", "n_inserted")} == {
        k: want[k] for k in ("n_deleted", "n_updated", "n_inserted")
    }
    a = read_version_mor(spark, root)
    b = read_version_mor(spark, root2)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_merge_statement_insert_cols_arity_refuses(spark, tmp_path):
    _, cat = _catalog_table(spark, tmp_path)
    spark.createDataFrame([(1, 2.0)], "k int, delta double").createOrReplaceTempView(
        "arity_src"
    )
    with pytest.raises(ValueError, match="column"):
        run_mutation_sql(
            spark,
            "MERGE INTO t USING arity_src ON target.k = source.k "
            "WHEN NOT MATCHED THEN INSERT (k, val) VALUES (source.k)",
            cat,
        )


def test_assignment_list_respects_nested_commas(spark, tmp_path):
    from pyspark_big_data_spark.operators.deletes import read_version_mor

    _, cat = _catalog_table(spark, tmp_path)
    res = run_mutation_sql(
        spark,
        "UPDATE t SET name = concat(name, '-', 'x'), val = round(val, 1) "
        "WHERE k = 2",
        cat,
    )
    assert res["n_updated"] == 1
    got = read_version_mor(spark, cat["t"]).filter("k = 2").collect()
    assert got[0]["name"] == "u2-x"


def test_merge_statement_not_matched_by_source(spark, tmp_path):
    from pyspark_big_data_spark.operators.deletes import read_version_mor
    from pyspark_big_data_spark.operators.merge import merge_into

    root, cat = _catalog_table(spark, tmp_path)
    root2, _ = _catalog_table(spark, tmp_path, "t2")
    src = spark.createDataFrame([(2,), (4,)], "k int")
    src.createOrReplaceTempView("bysrc_stmt_src")
    res = run_mutation_sql(
        spark,
        """
        MERGE INTO t USING bysrc_stmt_src ON target.k = source.k
        WHEN MATCHED THEN UPDATE SET val = target.val + 1
        WHEN NOT MATCHED BY SOURCE AND target.k >= 8 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET name = 'gone'
        """,
        cat,
    )
    want = merge_into(
        spark,
        root2,
        src,
        "k",
        when_matched_update=True,
        update_set={"val": "target.val + 1"},
        when_not_matched_insert=None,
        when_not_matched_by_source_delete="target.k >= 8",
        when_not_matched_by_source_update=True,
        not_matched_by_source_set={"name": "'gone'"},
    )
    assert {k: res[k] for k in ("n_deleted", "n_updated", "n_inserted")} == {
        k: want[k] for k in ("n_deleted", "n_updated", "n_inserted")
    }
    a = read_version_mor(spark, root)
    b = read_version_mor(spark, root2)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_by_source_grammar_refusals(spark, tmp_path):
    _, cat = _catalog_table(spark, tmp_path)
    spark.createDataFrame([(1,)], "k int").createOrReplaceTempView("bysrc_bad")
    with pytest.raises(ValueError, match="meaningless"):
        run_mutation_sql(
            spark,
            "MERGE INTO t USING bysrc_bad ON target.k = source.k "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *",
            cat,
        )
    with pytest.raises(ValueError, match="DELETE first"):
        run_mutation_sql(
            spark,
            "MERGE INTO t USING bysrc_bad ON target.k = source.k "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET name = 'x' "
            "WHEN NOT MATCHED BY SOURCE AND k < 3 THEN DELETE",
            cat,
        )
    with pytest.raises(ValueError, match="did you mean"):
        run_mutation_sql(
            spark,
            "MERGE INTO t USING bysrc_bad ON target.k = source.k "
            "WHEN MATCHED BY SOURCE THEN DELETE",
            cat,
        )


def test_ops_statements_match_api(spark, tmp_path):
    """DESCRIBE HISTORY / VACUUM / OPTIMIZE statement forms dispatch to
    snapshot_history / expire_versions / compact_version with
    bit-identical results."""
    from pyspark_big_data_spark.operators.versioned import (
        list_versions,
        snapshot_history,
    )

    root = str(tmp_path / "vds")
    for i in range(4):
        write_version(_df(spark, 0, 10 + i), root)
    cat = {"t": root}

    hist = run_mutation_sql(spark, "DESCRIBE HISTORY t", cat).collect()
    want = snapshot_history(spark, root)
    assert [r["version"] for r in hist] == [h["version"] for h in want]
    assert [r["n_files"] for r in hist] == [h["n_files"] for h in want]
    assert [r["n_rows"] for r in hist] == [h["n_rows"] for h in want]

    expired = run_mutation_sql(spark, "VACUUM t KEEP 2", cat)
    assert expired == [0, 1]
    assert list_versions(spark, root) == [2, 3]

    res = run_mutation_sql(spark, "OPTIMIZE t TARGET 1 FILES", cat)
    assert res["version"] == 4
    v = latest_version(spark, root)
    assert read_version(spark, root, v).count() == 13

    with pytest.raises(ValueError, match="documented mutation-SQL subset"):
        run_mutation_sql(spark, "OPTIMIZE t", cat)  # arity is explicit
